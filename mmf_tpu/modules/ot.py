"""Optimal transport (IPOT) for UNITER's WRA head
(parity with mmf/modules/ot.py).

Fixed-iteration Sinkhorn-style loop via lax.fori_loop; the transport plan
is computed under stop_gradient (the reference wraps ipot in no_grad)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_matrix_cosine(x, y, eps: float = 1e-5):
    """Pairwise cosine distance [B,Lx,D],[B,Ly,D] -> [B,Lx,Ly]."""
    x_norm = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    y_norm = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return 1.0 - jnp.einsum("bmd,bnd->bmn", x_norm, y_norm)


def trace(x):
    return jnp.trace(x, axis1=-2, axis2=-1)


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad, beta, iteration, k):
    """Inexact proximal point OT (reference ot.py:38-78). Shapes:
    C [B,M,N]; x_len [B]; x_pad [B,M] bool; y_* likewise."""
    b, m, n = C.shape
    sigma = jnp.ones((b, m), C.dtype) / x_len[:, None]
    T = jnp.ones((b, n, m), C.dtype)
    A = jnp.exp(-jnp.swapaxes(C, 1, 2) / beta)

    sigma = jnp.where(x_pad, 0.0, sigma)
    joint_pad_t = jnp.swapaxes(joint_pad, 1, 2)
    T = jnp.where(joint_pad_t, 0.0, T)
    A = jnp.where(joint_pad_t, 0.0, A)

    x_len_b = x_len[:, None, None]
    y_len_b = y_len[:, None, None]
    x_mask = (x_pad.astype(C.dtype) * 1e4)[:, None, :]
    y_mask = (y_pad.astype(C.dtype) * 1e4)[:, None, :]

    def outer(i, carry):
        T, sigma = carry
        Q = A * T  # [b, n, m]
        sigma0 = sigma.reshape(b, m, 1)

        def inner(j, carry2):
            sigma_c, delta_c = carry2
            delta = 1.0 / (
                y_len_b * jnp.matmul(Q, sigma_c).reshape(b, 1, n) + y_mask
            )
            sigma_new = 1.0 / (x_len_b * jnp.matmul(delta, Q) + x_mask)
            return jnp.swapaxes(sigma_new, 1, 2), delta

        sigma_f, delta_f = jax.lax.fori_loop(
            0, k, inner, (sigma0, jnp.zeros((b, 1, n), C.dtype))
        )
        T_new = delta_f.reshape(b, n, 1) * Q * jnp.swapaxes(sigma_f, 1, 2)
        return T_new, sigma_f[:, :, 0]

    T, _ = jax.lax.fori_loop(0, iteration, outer, (T, sigma))
    return jnp.where(joint_pad_t, 0.0, T)


def optimal_transport_dist(
    txt_emb, img_emb, txt_pad, img_pad, beta=0.5, iteration=50, k=1
):
    """Wasserstein distance between token sets (reference ot.py:81-102)."""
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)

    txt_len = (txt_pad.shape[1] - txt_pad.sum(axis=1)).astype(cost.dtype)
    img_len = (img_pad.shape[1] - img_pad.sum(axis=1)).astype(cost.dtype)

    T = ipot(
        jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
        joint_pad, beta, iteration, k,
    )
    return trace(jnp.matmul(cost, jax.lax.stop_gradient(T)))
