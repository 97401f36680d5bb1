"""Learning-rate schedules (port of reference train/lr_common_manager.py as
optax-compatible step->lr functions)."""
import jax.numpy as jnp


def exp_decay_lr(lr_init=1e-4, decay_step=100000, decay_rate=0.5, lr_min=1e-5):
    """ExpDecayLR (lr_common_manager.py:19-29)."""
    def schedule(step):
        return jnp.maximum(lr_init * decay_rate ** (step // decay_step), lr_min)
    return schedule


def warm_up_exp_decay_lr(lr_warm=1e-5, warm_step=1000, lr_init=1e-4,
                         decay_step=100000, decay_rate=0.5, lr_min=1e-5):
    """WarmUpExpDecayLR (lr_common_manager.py:31-45)."""
    def schedule(step):
        decayed = jnp.maximum(
            lr_init * decay_rate ** ((step - warm_step) // decay_step), lr_min)
        return jnp.where(step < warm_step, lr_warm, decayed)
    return schedule


name2lr_manager = {
    'exp_decay': exp_decay_lr,
    'warm_up_exp_decay': warm_up_exp_decay_lr,
}
