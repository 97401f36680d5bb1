"""Disk-format eval with TRAINED weights (VERDICT r4 item 3).

Runs the production config through the exact file-IO path the reference's
eval.py:87-152 is built around — LINEMOD on-disk layout, native JPEG decode,
split parsing, cli.eval batching — and asserts real accuracy, not just that
the code path executes (every earlier performance.log line was random-weight).

Requires a real TPU and the committed trained snapshots; skips otherwise.
Like tests/test_tpu_compiled.py, work happens in a subprocess with a clean
JAX_PLATFORMS (the suite conftest forces cpu)."""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import jax
print('TPU' if any(d.platform != 'cpu' for d in jax.devices()) else 'NOTPU')
"""

_BODY = """
import json
import os
import sys
sys.path.insert(0, %(repo)r)
os.chdir(%(repo)r)
import subprocess
name = 'r5evalcube'
root = os.path.join('data', 'LINEMOD', name)
if not os.path.exists(os.path.join(root, 'distance.txt')):
    subprocess.run([sys.executable, 'scripts/make_linemod_synthetic.py',
                    '--name', name, '--n_views', '128'], check=True)
from gen6d_tpu.cli.eval import evaluate
m = evaluate('configs/gen6d_synthetic.yaml', 'linemod/' + name,
             'linemod_test')
print('RESULT ' + json.dumps({k: float(v) for k, v in m.items()
                              if k in ('add-0.1d', 'prj-5')}))
"""


def _clean_env():
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    return env


_BODY_GENMOP = """
import json
import os
import sys
sys.path.insert(0, %(repo)r)
os.chdir(%(repo)r)
import subprocess
name = 'r5evalobj'
root = os.path.join('data', 'GenMOP', name + '-ref')
if not os.path.exists(root):
    subprocess.run([sys.executable, 'scripts/make_genmop_synthetic.py',
                    '--name', name, '--n_ref', '96', '--n_test', '24',
                    '--shape', 'cube', '--texture', 'checks', '--seed', '21'],
                   check=True)
from gen6d_tpu.cli.eval import evaluate
m = evaluate('configs/gen6d_synthetic.yaml', 'genmop/' + name)
print('RESULT ' + json.dumps({k: float(v) for k, v in m.items()
                              if k in ('add-0.1d', 'prj-5')}))
"""


def _run_eval(body_tpl, floor):
    env = _clean_env()
    probe = subprocess.run([sys.executable, '-c', _PROBE], env=env,
                           capture_output=True, text=True, cwd=REPO)
    if 'TPU' not in probe.stdout or 'NOTPU' in probe.stdout:
        pytest.skip('no TPU attached')
    if not os.path.exists(os.path.join(REPO, 'weights', 'refiner_r4.npz')):
        pytest.skip('trained weight snapshots missing')
    res = subprocess.run([sys.executable, '-c', body_tpl % {'repo': REPO}],
                         env=env, capture_output=True, text=True, cwd=REPO,
                         timeout=3600)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith('RESULT ')]
    assert line, res.stdout[-2000:]
    import json
    m = json.loads(line[0][len('RESULT '):])
    assert m['add-0.1d'] >= floor, m
    return m


def test_linemod_eval_trained_accuracy():
    # the round-4 production operating point scores 0.78 on the held-out
    # synthetic scene; the disk twin must stay in that regime
    _run_eval(_BODY, 0.7)


def test_genmop_eval_trained_accuracy():
    # GenMOP twin: test sequence vs ref sequence through align.pkl gauge
    # transfer (reference eval.py:101-107) with trained weights
    _run_eval(_BODY_GENMOP, 0.7)
