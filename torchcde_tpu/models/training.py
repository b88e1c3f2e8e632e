"""Training-step construction for Neural CDE models.

The end-to-end per-batch computation of the reference training loop
(/root/reference/example/time_series_classification.py:151-157): forward solve
-> BCE-with-logits loss -> gradient -> optimizer update, here as a single
jitted (and shardable) function.
"""

import jax
import jax.numpy as jnp
import optax

from .neural_cde import NeuralCDEConfig, bce_with_logits, neural_cde_apply


def make_loss_fn(cfg: NeuralCDEConfig):
    def loss_fn(params, coeffs, labels):
        # Loss math in AT LEAST f32 even under a bf16 compute_dtype
        # (standard mixed-precision discipline: log1p/exp in bf16 lose the
        # loss signal); f64 models keep their f64 loss.
        logits = neural_cde_apply(params, cfg, coeffs)[..., 0]
        ldt = jnp.promote_types(logits.dtype, jnp.float32)
        return bce_with_logits(logits.astype(ldt), labels.astype(ldt))

    return loss_fn


def make_train_step(cfg: NeuralCDEConfig, optimizer):
    loss_fn = make_loss_fn(cfg)

    def train_step(params, opt_state, coeffs, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, coeffs, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def accuracy(params, cfg: NeuralCDEConfig, coeffs, labels):
    logits = neural_cde_apply(params, cfg, coeffs)[..., 0]
    pred = (jax.nn.sigmoid(logits) > 0.5).astype(labels.dtype)
    return jnp.mean((pred == labels).astype(jnp.float32))
