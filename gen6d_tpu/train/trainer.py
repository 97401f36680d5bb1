"""Step-based training loop with checkpoint/resume and best-model selection.

Port of the reference Trainer (train/trainer.py:19-208) on optax/orbax:
- step loop to ``total_step``, loss = sum of 'loss*' entries, Adam with the
  exp-decay schedule (trainer.py:109-140);
- validation every ``val_interval`` over a fixed >=128-sample held-out scene
  with best-checkpoint selection by a key metric (trainer.py:144-152;
  ValidationEvaluator train_valid.py:16-44; metrics gen6d_tpu/train/metrics.py);
- latest checkpoint (params + optimizer state + step, reference
  trainer.py:187-194) every ``save_interval`` + auto-resume; ``model_best`` is
  a params-only inference artifact (estimator.py:121-123);
- scalar logging to a ``train.txt``-style log (train_tools.py:93-108).

Data comes from the on-device multi-scene batch builders
(gen6d_tpu/train/datasets.py); train and val scene pools are disjoint.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from gen6d_tpu.models import name2network
from gen6d_tpu.train.datasets import (DEFAULT_TRAIN_SCENES,
                                      DEFAULT_VAL_SCENES, SyntheticTrainData)
from gen6d_tpu.train.lr import name2lr_manager
from gen6d_tpu.train.steps import (adam, make_detector_train_step,
                                   make_refiner_train_step,
                                   make_selector_train_step)

DEFAULT_TRAIN_CFG = {
    'network': 'detector',
    'name': 'detector_synthetic',
    'lr_type': 'exp_decay',
    'lr_cfg': {'lr_init': 1.0e-4, 'decay_step': 100000, 'decay_rate': 0.5},
    'total_step': 2000,
    'train_log_step': 20,
    'val_interval': 500,
    'save_interval': 500,
    'batch_size': 4,
    'val_samples': 128,
    # >0: refresh the streamed view windows of file-backed scenes every N
    # steps (datasets.SyntheticTrainData.restage; needs dataset
    # max_staged_views)
    'restage_interval': 0,
    'model_dir': 'data/model',
    'dataset': {'n_views': 64, 'seed': 0},
    # computation dtype for the networks during training ('bfloat16' halves
    # activation memory on TPU; params/optimizer stay f32)
    'dtype': None,
}


class Trainer:
    def __init__(self, cfg=None):
        from gen6d_tpu.utils.jit_cache import enable_persistent_cache
        enable_persistent_cache()
        self.cfg = {**DEFAULT_TRAIN_CFG, **(cfg or {})}
        net_name = self.cfg['network']
        kwargs = {}
        if net_name == 'refiner':
            kwargs['grad_kernels'] = True  # custom-VJP Pallas kernels
        if self.cfg.get('dtype') == 'bfloat16':
            kwargs['dtype'] = jnp.bfloat16
        self.network = name2network[net_name](self.cfg.get('network_cfg'),
                                              **kwargs)
        self.model_dir = os.path.abspath(
            os.path.join(self.cfg['model_dir'], self.cfg['name']))
        os.makedirs(self.model_dir, exist_ok=True)

        schedule = name2lr_manager[self.cfg['lr_type']](**self.cfg['lr_cfg'])
        self.optimizer = adam(schedule)
        dcfg = dict(self.cfg['dataset'])
        val_scenes = dcfg.pop('val_scenes', DEFAULT_VAL_SCENES)
        dcfg.setdefault('scenes', DEFAULT_TRAIN_SCENES)
        self.data = SyntheticTrainData(**dcfg)
        # held-out validation scene(s), clean batches (eval-like conditions);
        # train-only sampling/background knobs don't apply
        vcfg = {k: v for k, v in dcfg.items()
                if k not in ('scene_probs', 'background_dir',
                             'background_pool_size', 'background_res')}
        self.val_data = SyntheticTrainData(
            **{**vcfg, 'scenes': val_scenes, 'augment': False,
               'distractors': False})

        # refiner: validate on cached det/sel predictions when available
        # (reference RefinerValDataset, train_dataset.py:1475-1581; pkls from
        # cli/prepare.py gen_val_set)
        self.ref_val = None
        rv = self.cfg.get('refiner_val')
        if net_name == 'refiner' and rv:
            try:
                from gen6d_tpu.train.datasets import RefinerValData
                self.ref_val = RefinerValData(**rv)
                print(f'refiner val: {len(self.ref_val)} cached '
                      f'det/sel initializations')
            except FileNotFoundError as e:
                print(f'WARNING: refiner_val pkls missing ({e}); '
                      'falling back to synthetic-noise validation')

        makers = {'detector': make_detector_train_step,
                  'selector': make_selector_train_step,
                  'refiner': make_refiner_train_step}
        maker_kwargs = {}
        if net_name == 'detector' and 'scale_ratio' in self.cfg:
            maker_kwargs['scale_ratio'] = float(self.cfg['scale_ratio'])
        self.train_step = makers[net_name](self.network, self.optimizer,
                                           **maker_kwargs)
        self._init_state()
        self.ckpt = ocp.StandardCheckpointer()
        # fine-tune: initialize params (not optimizer/step) from another run's
        # checkpoint; a later resume checkpoint in model_dir takes precedence
        init_from = self.cfg.get('init_from')
        if init_from and not os.path.exists(
                os.path.join(self.model_dir, 'model')):
            # the npz fallback only makes sense for orbax run dirs
            # (data/model/<run>/model_best -> weights/<run>.npz); for a
            # missing .npz init_from there is nothing sane to fall back to
            npz_alt = None if init_from.endswith('.npz') else os.path.join(
                'weights', os.path.basename(os.path.dirname(init_from)) + '.npz')
            if init_from.endswith('.npz') and os.path.exists(init_from):
                from gen6d_tpu.models.weights_io import load_params_npz
                self.params = load_params_npz(init_from, self.params)
                print(f'initialized params from {init_from}')
            elif os.path.exists(init_from):
                self.params = self.ckpt.restore(os.path.abspath(init_from),
                                                self.params)
                print(f'initialized params from {init_from}')
            elif npz_alt and os.path.exists(npz_alt):
                # orbax dirs die with the (gitignored) data/ tree; the
                # committed weights/<run>.npz snapshot survives resets
                from gen6d_tpu.models.weights_io import load_params_npz
                self.params = load_params_npz(npz_alt, self.params)
                print(f'initialized params from npz snapshot {npz_alt} '
                      f'({init_from} missing)')
            else:
                # a silently-missing warm start wastes the whole stage budget
                # (from-scratch pool training stalls; ADVICE r3 high)
                raise FileNotFoundError(
                    f'init_from {init_from} missing and no npz snapshot at '
                    f'{npz_alt}; refusing to train from scratch (drop '
                    f'init_from from the config to train from scratch)')

    def _batch(self, key, data=None):
        qn = self.cfg['batch_size']
        data = data or self.data
        if self.cfg['network'] == 'detector':
            return data.det_batch(key, qn=qn)
        if self.cfg['network'] == 'selector':
            return data.sel_batch(key, qn=qn)
        return data.ref_batch(key, qn=max(1, qn // 2))

    def _init_state(self):
        key = jax.random.PRNGKey(self.cfg.get('seed', 0))
        batch = self._batch(key)
        net = self.cfg['network']
        if net == 'detector':
            args = (batch['ref_imgs'][:2], batch['que_imgs'][:1])
        elif net == 'selector':
            args = (batch['ref_imgs'][:, :2], batch['ref_poses'][:2],
                    batch['object_center'], batch['object_vert'],
                    batch['que_imgs'][:1])
        else:
            args = (batch['que_imgs'][:1], batch['que_Ks_in'][:1],
                    batch['que_poses_in'][:1], batch['ref_imgs'][:1, :2],
                    batch['ref_poses'][:1, :2], batch['ref_Ks'][:1, :2])
        self.params = jax.jit(self.network.init)(key, *args)
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0
        self.best_metric = -np.inf

    # ----------------------------------------------------------- checkpoints
    def _save(self, tag, with_opt=False):
        path = os.path.join(self.model_dir, tag)
        state = {'params': self.params, 'opt_state': self.opt_state} \
            if with_opt else self.params
        self.ckpt.save(path, state, force=True)
        # orbax saves are async; an interpreter exiting mid-save corrupts the
        # final checkpoint ("cannot schedule new futures after shutdown")
        self.ckpt.wait_until_finished()
        with open(os.path.join(self.model_dir, f'{tag}.json'), 'w') as f:
            json.dump({'step': self.step,
                       'best_metric': float(self.best_metric),
                       'with_opt': with_opt}, f)
        if tag == 'model_best':
            # git-persistable snapshot: orbax dirs under data/ die with the
            # environment (weights_io module docstring)
            from gen6d_tpu.models.weights_io import save_params_npz
            save_params_npz(self.params,
                            os.path.join(self.cfg.get('weights_dir', 'weights'),
                                         f"{self.cfg['name']}.npz"))

    def _try_resume(self):
        path = os.path.join(self.model_dir, 'model')
        meta = os.path.join(self.model_dir, 'model.json')
        if os.path.exists(path) and os.path.exists(meta):
            with open(meta) as f:
                info = json.load(f)
            if info.get('with_opt'):
                ref = {'params': self.params, 'opt_state': self.opt_state}
                state = self.ckpt.restore(path, ref)
                self.params = state['params']
                self.opt_state = state['opt_state']
            else:  # params-only checkpoint from an older run
                self.params = self.ckpt.restore(path, self.params)
            self.step = info['step']
            self.best_metric = info.get('best_metric', -np.inf)
            print(f'resumed from step {self.step}')

    # ------------------------------------------------------------ validation
    def _val_fn(self):
        """Jitted validation forward+metrics (un-jitted eval executes eagerly
        op-by-op on the TPU backend and takes minutes)."""
        from gen6d_tpu.train import metrics as M
        from gen6d_tpu.models.detector import parse_detection
        net = self.cfg['network']
        network = self.network

        if net == 'detector':
            @jax.jit
            def run(params, batch):
                out = network.apply(params, batch['ref_imgs'], batch['que_imgs'])
                pos, scl = parse_detection(out['scores'],
                                           out['select_pr_scale'],
                                           out['select_pr_offset'])
                iou = M.detection_iou(pos, scl, batch['cens'],
                                      batch['scale_diff'], ref_shape=(128, 128))
                return {'iou': jnp.mean(iou)}
            return run
        if net == 'selector':
            @jax.jit
            def run(params, batch):
                out = network.apply(params, batch['ref_imgs'],
                                    batch['ref_poses'], batch['object_center'],
                                    batch['object_vert'], batch['que_imgs'])
                m = M.selection_metrics(out['ref_vp_logits'],
                                        batch['ref_vp_scores'],
                                        out['angles_pr'], batch['angles_r2q'],
                                        batch['gt_ref_ids'])
                return {k: jnp.mean(v) for k, v in m.items()}
            return run

        src = self.ref_val if self.ref_val is not None else self.val_data
        object_pts = jnp.asarray(
            (np.asarray(src.database.scene.point_cloud)
             - np.asarray(src.center)) * (2.0 / src.diameter),
            jnp.float32)

        @jax.jit
        def run(params, batch):
            from gen6d_tpu.geometry.pose import pose_apply
            from gen6d_tpu.train.losses import refiner_loss
            out = network.apply(params, batch['que_imgs'], batch['que_Ks_in'],
                                batch['que_poses_in'], batch['ref_imgs'],
                                batch['ref_poses'], batch['ref_Ks'])
            grids = pose_apply(batch['que_poses_in'], out['vol_coords'])
            loss = refiner_loss(out['rotation'], out['offset'], out['scale'],
                                grids, batch['object_center'],
                                batch['que_poses_in'],
                                batch['poses_sim_in_to_que'])
            # full pose recomposition metrics (reference metrics.py:128-246)
            pm = M.refiner_pose_metrics(out['rotation'], out['scale'],
                                        out['offset'], batch['que_poses_in'],
                                        batch['que_Ks_in'],
                                        batch['que_poses_warp'], object_pts,
                                        2.0)
            res = {'val_loss_pose': jnp.mean(loss)}
            res.update({k: jnp.mean(v) for k, v in pm.items()})
            return res
        return run

    def validate(self, key=None):
        """Fixed-key held-out evaluation over >= ``val_samples`` samples from
        the validation scene pool (the reference sweeps whole val sets,
        train_valid.py:16-44; val determinism per utils/dataset_utils.py:26-34).
        Returns (metrics dict, key metric)."""
        net = self.cfg['network']
        qn = self.cfg['batch_size'] if net != 'refiner' \
            else max(1, self.cfg['batch_size'] // 2)
        if not hasattr(self, '_val_run'):
            self._val_run = self._val_fn()
        acc = {}
        if self.ref_val is not None:
            # fixed sweep over the cached det/sel initializations
            n = (len(self.ref_val) // qn) * qn
            for b0 in range(0, n, qn):
                batch = self.ref_val.batch(np.arange(b0, b0 + qn))
                for k, v in self._val_run(self.params, batch).items():
                    acc.setdefault(k, []).append(float(v))
        else:
            n_batches = max(1, int(np.ceil(self.cfg['val_samples'] / qn)))
            for bi in range(n_batches):
                val_key = jax.random.PRNGKey(12345 + bi)
                batch = self._batch(val_key, data=self.val_data)
                for k, v in self._val_run(self.params, batch).items():
                    acc.setdefault(k, []).append(float(v))
        m = {k: float(np.mean(v)) for k, v in acc.items()}
        # explicit best-checkpoint key, e.g. '-pose_prj_err' (leading '-'
        # negates an error so higher stays better): the polish-refiner
        # stage selects on projection error, not the default object error
        vk = self.cfg.get('val_key')
        if vk:
            sign = -1.0 if vk.startswith('-') else 1.0
            return m, sign * m[vk.lstrip('-')]
        if net == 'detector':
            return m, m['iou']
        if net == 'selector':
            return m, m['sel_acc_3'] + m['sel_ang_5']
        if self.ref_val is not None:
            # best-checkpoint selection on the continuous object-space pose
            # error instead of the reference's thresholded 'pose_add'
            # (metrics.py:261-262): at small val sets the 0.1d indicator
            # swings 6x between adjacent checkpoints (round-2
            # training_logs/refiner.txt) while the mean error is stable
            return m, -m['pose_obj_err']
        return m, -m['val_loss_pose']

    # --------------------------------------------------------------- analyze
    def analyze(self, n_batches=5, out_dir=None, restore_best=True):
        """Debug visualization over validation batches (the reference Analyzer
        trainer subclass + the metric classes' image dumps, trainer.py:211-257,
        metrics.py:46-58,215-245): writes composite jpgs per batch."""
        from PIL import Image
        from gen6d_tpu.utils.draw import concat_images_list, draw_bbox
        from gen6d_tpu.models.detector import parse_detection
        out_dir = out_dir or os.path.join(self.model_dir, 'analyze')
        os.makedirs(out_dir, exist_ok=True)
        if restore_best:
            best = os.path.join(self.model_dir, 'model_best')
            if os.path.exists(best):
                self.params = self.ckpt.restore(best, self.params)

        net = self.cfg['network']
        to_u8 = lambda x: np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)
        for bi in range(n_batches):
            key = jax.random.PRNGKey(1000 + bi)
            # alternate train-pool (augmented) and val-pool (clean) batches
            data = self.data if bi % 2 == 0 else self.val_data
            if net == 'detector':
                batch = data.det_batch(key, qn=self.cfg['batch_size'])
                out = jax.jit(self.network.apply)(self.params,
                                                  batch['ref_imgs'],
                                                  batch['que_imgs'])
                pos, scl = parse_detection(out['scores'],
                                           out['select_pr_scale'],
                                           out['select_pr_offset'])
                vis = []
                for qi in range(batch['que_imgs'].shape[0]):
                    img = to_u8(batch['que_imgs'][qi])
                    s_gt = float(batch['scale_diff'][qi]) * 128
                    c_gt = np.asarray(batch['cens'][qi])
                    img = draw_bbox(img, [c_gt[0] - s_gt / 2, c_gt[1] - s_gt / 2,
                                          s_gt, s_gt], (0, 255, 0))
                    s_pr = float(scl[qi]) * 128
                    c_pr = np.asarray(pos[qi])
                    img = draw_bbox(img, [c_pr[0] - s_pr / 2, c_pr[1] - s_pr / 2,
                                          s_pr, s_pr], (255, 0, 0))
                    vis.append(img)
                frame = concat_images_list(*vis)
            elif net == 'selector':
                batch = data.sel_batch(key, qn=self.cfg['batch_size'])
                out = jax.jit(self.network.apply)(
                    self.params, batch['ref_imgs'], batch['ref_poses'],
                    batch['object_center'], batch['object_vert'],
                    batch['que_imgs'])
                order = np.argsort(-np.asarray(out['ref_vp_logits']), 1)
                refs = np.asarray(batch['ref_imgs'])
                an = refs.shape[0]
                rows = []
                for qi in range(batch['que_imgs'].shape[0]):
                    row = [to_u8(batch['que_imgs'][qi])]
                    row += [to_u8(refs[an // 2, r]) for r in order[qi, :5]]
                    rows.append(concat_images_list(*row))
                frame = concat_images_list(*rows, vert=True)
            else:
                batch = data.ref_batch(key,
                                       qn=max(1, self.cfg['batch_size'] // 2))
                rows = []
                for qi in range(batch['que_imgs'].shape[0]):
                    row = [to_u8(batch['que_imgs'][qi])]
                    row += [to_u8(batch['ref_imgs'][qi, r])
                            for r in range(min(5, batch['ref_imgs'].shape[1]))]
                    rows.append(concat_images_list(*row))
                frame = concat_images_list(*rows, vert=True)
            Image.fromarray(frame).save(os.path.join(out_dir, f'{net}-{bi}.jpg'))
        return out_dir

    # ------------------------------------------------------------------- run
    def run(self):
        self._try_resume()
        cfg = self.cfg
        # graceful stop on SIGTERM (the pipeline's wall-clock `timeout`):
        # finish the in-flight step, save a resumable with-opt checkpoint,
        # and exit — instead of dying mid-orbax-write (VERDICT r3: a killed
        # save left model.orbax-checkpoint-tmp and resume fell back a stage)
        import signal
        self._stop = False

        def _on_term(signum, frame):
            self._stop = True
        signal.signal(signal.SIGTERM, _on_term)
        # per-step keys via fold_in: resume at step k reproduces the exact
        # batch sequence of an uninterrupted run
        base_key = jax.random.PRNGKey(cfg.get('seed', 0) + 1)
        log_path = os.path.join(self.model_dir, 'train.txt')
        # tensorboardX scalars (reference Logger, train_tools.py:93-108)
        try:
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(os.path.join(self.model_dir, 'tb'))
        except Exception:
            tb = None
        t0 = time.time()
        restage_every = int(cfg.get('restage_interval') or 0)
        while self.step < cfg['total_step']:
            if (restage_every and self.step % restage_every == 0
                    and self.data._stream_state):
                self.data.restage()
            sub = jax.random.fold_in(base_key, self.step)
            batch = self._batch(sub)
            self.params, self.opt_state, metrics = self.train_step(
                self.params, self.opt_state, batch)
            self.step += 1

            if self.step % cfg['train_log_step'] == 0:
                line = (f"step {self.step} " +
                        ' '.join(f'{k}={float(v):.5f}'
                                 for k, v in sorted(metrics.items())) +
                        f' ({time.time() - t0:.1f}s)')
                print(line)
                with open(log_path, 'a') as f:
                    f.write(line + '\n')
                if tb is not None:
                    for k, v in metrics.items():
                        tb.add_scalar(f'train/{k}', float(v), self.step)

            if self.step % cfg['val_interval'] == 0 or self.step == cfg['total_step']:
                val_metrics, key_metric = self.validate()
                line = f"val step {self.step} key={key_metric:.5f} {val_metrics}"
                print(line)
                with open(log_path, 'a') as f:
                    f.write(line + '\n')
                if tb is not None:
                    for k, v in val_metrics.items():
                        tb.add_scalar(f'val/{k}', float(v), self.step)
                if key_metric > self.best_metric:
                    self.best_metric = key_metric
                    self._save('model_best')

            if self.step % cfg['save_interval'] == 0 and not self._stop:
                self._save('model', with_opt=True)
            if self._stop:
                print(f'SIGTERM at step {self.step}: saving resumable '
                      f'checkpoint and exiting')
                break
        self._save('model', with_opt=True)
        return self.params
