"""Persistent XLA compilation cache.

The fused serving program + reference build take ~60-90s of one-time
compilation per process (VERDICT round-1: build_s 58s dominated small evals).
JAX's persistent compilation cache stores compiled executables on disk keyed
by HLO hash, so every process after the first warm-starts in seconds.

Enabled by the estimator loader, bench, eval and trainer. Override the
location with GEN6D_JIT_CACHE; disable with GEN6D_JIT_CACHE=0.
"""
import os

_DONE = False


def enable_persistent_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    loc = os.environ.get('GEN6D_JIT_CACHE',
                         os.path.expanduser('~/.cache/gen6d_jit'))
    if loc == '0':
        return
    try:
        import jax
        # version-stamped subdirectory (ADVICE r3): entries from another
        # jax/XLA version become visibly-absent directories rather than
        # silently-missed root files, and can be pruned wholesale
        loc = os.path.join(loc, f'jax-{jax.__version__}')
        jax.config.update('jax_compilation_cache_dir', loc)
        # cache EVERYTHING: the axon remote-compile path reports near-zero
        # host-side compile times even for programs whose remote compile takes
        # a minute (e.g. the detector load_ref VGG sweep: 58s wall, reported
        # <1s), so any time/size gate silently drops exactly the entries that
        # matter. Tiny-program entries cost a few KB each.
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:
        pass
