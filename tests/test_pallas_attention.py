import jax
import jax.numpy as jnp
import numpy as np

from hudiff_tpu.ops.pallas_attention import attention


def test_pallas_matches_einsum():
    rng = jax.random.PRNGKey(0)
    B, L, H, D = 2, 37, 4, 16
    q = jax.random.normal(rng, (B, L, H, D))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, L, H, D))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, H, D))
    scale = 1.0 / np.sqrt(D)
    ref = attention(q, k, v, scale, use_pallas='never')
    out = attention(q, k, v, scale, use_pallas='always')  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_bf16():
    rng = jax.random.PRNGKey(3)
    B, L, H, D = 1, 291, 8, 64
    q = jax.random.normal(rng, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (B, L, H, D), jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)
    ref = attention(q, k, v, scale, use_pallas='never')
    out = attention(q, k, v, scale, use_pallas='always')
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)
