"""ops/flash_nce.py vs the plain jnp logsumexp oracle (interpret mode)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from recommendar_systems_tpu.ops.flash_nce import row_lse


def _oracle(q, k):
    b = jnp.bfloat16
    s = jnp.matmul(q.astype(b), k.astype(b).T,
                   preferred_element_type=jnp.float32)
    return jax.nn.logsumexp(s, axis=1)


def test_row_lse_matches_oracle():
    rng = np.random.default_rng(0)
    # deliberately unaligned sizes to exercise the padding paths
    q = jnp.asarray(rng.normal(size=(70, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(150, 16)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(row_lse(q, k)), np.asarray(_oracle(q, k)),
        rtol=2e-2, atol=2e-2,
    )


def test_row_lse_grads_match_oracle():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(48, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(130, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48,)).astype(np.float32))

    def loss_flash(q, k):
        return jnp.sum(row_lse(q, k) * w)

    def loss_oracle(q, k):
        return jnp.sum(_oracle(q, k) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1))(q, k)
    go = jax.grad(loss_oracle, argnums=(0, 1))(q, k)
    for a, b, tag in [(gf[0], go[0], "dq"), (gf[1], go[1], "dk")]:
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert err < 3e-2, (tag, err)


def test_infonce_flash_path_matches_plain():
    from recommendar_systems_tpu.models.losses import infonce

    rng = np.random.default_rng(2)
    v1 = jnp.asarray(rng.normal(size=(4200, 16)).astype(np.float32))
    v2 = jnp.asarray(rng.normal(size=(4200, 16)).astype(np.float32))
    flash = float(infonce(v1, v2, 0.2))

    v1n = v1 / (jnp.linalg.norm(v1, axis=1, keepdims=True) + 1e-12)
    v2n = v2 / (jnp.linalg.norm(v2, axis=1, keepdims=True) + 1e-12)
    pos = jnp.sum(v1n * v2n, axis=1) / 0.2
    lse = jax.nn.logsumexp(v1n @ v2n.T / 0.2, axis=1)
    plain = float(jnp.mean(lse - pos))
    assert abs(flash - plain) / abs(plain) < 1e-2, (flash, plain)
