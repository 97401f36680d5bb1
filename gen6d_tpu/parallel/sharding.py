"""Device meshes and shardings.

The reference is strictly single-GPU (trainer.py:71-74 raises on multi_gpus;
no torch.distributed anywhere — SURVEY.md §2.10). The TPU build scales over two
real axes:

- ``dp``: data parallel over query batches (training and the batched pose
  server);
- ``view``: reference-view parallel — the Gen6D analogue of sequence
  parallelism. The selector correlates the query against rfn=64 views x 5
  angles (selector.py:184-189); sharding the view axis splits that tensor
  across devices and XLA GSPMD inserts the cross-view collectives (the
  instance-norm means over views and the attention over views become
  all-reduces over ICI).

There is no pipeline or expert axis in this model family (nothing
pipeline-/MoE-shaped exists in the reference; SURVEY.md §2.10).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, dp=None, view=None):
    """Build a (dp, view) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None or view is None:
        # default: shard views up to 4-way (the rfn=64 axis), rest data-parallel
        view = view or max(d for d in (1, 2, 4) if n % d == 0 and d <= n)
        dp = dp or n // view
    assert dp * view == n, (dp, view, n)
    arr = np.asarray(devices).reshape(dp, view)
    return Mesh(arr, ('dp', 'view'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh):
    """Shard the leading (query-batch) axis over dp."""
    return NamedSharding(mesh, P('dp'))


def view_sharding(mesh, axis=1):
    """Shard a reference-view axis over the view mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = 'view'
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh, tree):
    """Put a batch pytree on the mesh with the leading axis over dp."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)
