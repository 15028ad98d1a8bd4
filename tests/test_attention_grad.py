"""Gradients through the Pallas attention path (custom VJP) match XLA."""

import jax
import jax.numpy as jnp
import numpy as np

from flash_diffusion_tpu.ops import dot_product_attention
from flash_diffusion_tpu.ops.attention import _xla_attention


def test_pallas_vjp_matches_xla_grads():
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (1, 128, 2, 16))
    k = jax.random.normal(kk, (1, 96, 2, 16))
    v = jax.random.normal(kv, (1, 96, 2, 16))
    cotangent = jax.random.normal(kg, (1, 128, 2, 16))

    def loss_pallas(q, k, v):
        return jnp.sum(dot_product_attention(q, k, v, use_pallas=True) * cotangent)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None, 16**-0.5) * cotangent)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        assert np.allclose(np.array(a), np.array(b), atol=2e-2), (
            np.abs(np.array(a) - np.array(b)).max()
        )

    # also under jit (training path)
    gj = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(gj, gp):
        assert np.allclose(np.array(a), np.array(b), atol=1e-4)
