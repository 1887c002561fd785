"""Fused multi-head attention for TPU: one Pallas flash-attention kernel
family shared by every transformer in the zoo.

This single kernel serves (per SURVEY.md §7.6):
  - single-stream self-attention (VisualBERT / ViLT / MMBT / M4C-MMT),
  - two-stream co-attention (ViLBERT: same kernel, q from one stream,
    k/v from the other, asymmetric seq lens),
  - prefix-LM masked decoding (M4C: causal mask on the decoder span,
    delivered as an additive bias).

Design notes (TPU-first):
  - blockwise online-softmax (flash-attention) over the kv axis, so the
    [Sq, Skv] score matrix never hits HBM;
  - f32 accumulation on the MXU regardless of input dtype (bf16 in, bf16
    out, f32 partials);
  - additive bias (padding + structural masks) broadcast over heads —
    at BERT-scale seq lens (<=512) the [B, 1, Sq, Skv] bias is tiny;
  - backward pass = rematerialized XLA attention (inference is the
    headline metric; the recompute VJP keeps training memory at flash
    levels while XLA's fused softmax-backward handles the FLOPs).

Reference behavior being replaced: torch SDPA inside BertSelfAttentionJit
(reference mmf/modules/hf_layers.py:138-215) and BertBiAttention
(mmf/models/vilbert.py:347-475).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-enabled jaxlibs; interpret mode needs pl only
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path (correctness baseline + backward recompute)
# ---------------------------------------------------------------------------
def _logits_dtype(q: jax.Array):
    """Storage dtype for the materialized [B,H,Sq,Skv] logits.

    Attention here is HBM-bound on this tensor (measured on v5e at
    B=64,H=12,S=228,D=64: 2008us with f32 logits vs 1619us with bf16 —
    ~20% of attention time is logit traffic). When the compute dtype is
    already bf16, storing logits in bf16 adds only ~1 ulp of output noise
    (max 1.6e-2 at bf16 resolution, mean 3e-4) because the softmax still
    reduces in f32. f32 inputs keep f32 logits, so the exact-parity path
    is untouched. Override with MMF_TPU_ATTENTION_LOGITS=f32|bf16.
    """
    import os

    forced = os.environ.get("MMF_TPU_ATTENTION_LOGITS", "").lower()
    if forced == "f32":
        return jnp.float32
    if forced == "bf16":
        return jnp.bfloat16
    return jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32


def mha_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain XLA attention. q: [B,H,Sq,D], k/v: [B,H,Skv,D],
    bias: broadcastable to [B,H,Sq,Skv] (additive, -inf style masking).

    dropout_rate/dropout_rng: attention-probability dropout (reference
    BertSelfAttention applies ``self.dropout(attention_probs)``,
    hf_layers.py:138-215); active only when both are provided."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    ldt = _logits_dtype(q)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=ldt
    )
    logits = logits * jnp.asarray(scale, ldt)
    if bias is not None:
        logits = logits + bias.astype(ldt)
    # softmax always reduces in f32 (upcast fuses into the consumer)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, probs.shape
        )
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------
def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, block_k,
                  kv_len):
    """One (batch, head, q-block) program: online softmax over kv blocks.

    q_ref: [block_q, d]; k_ref/v_ref: [Skv_pad, d]; bias_ref: [block_q,
    Skv_pad] or None; o_ref: [block_q, d].
    """
    q = q_ref[...].astype(jnp.float32) * scale
    block_q, d = q.shape
    num_kv_blocks = kv_len // block_k

    def body(i, carry):
        acc, m_prev, l_prev = carry
        kv_start = i * block_k
        kb = k_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)
        vb = v_ref[pl.ds(kv_start, block_k), :].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [block_q, block_k]
        if bias_ref is not None:
            s = s + bias_ref[:, pl.ds(kv_start, block_k)].astype(jnp.float32)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv_blocks, body, (acc0, m0, l0))

    # rows that are fully masked (all -inf) produce l == 0; emit zeros
    l = jnp.where(l == 0.0, 1.0, l)
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret):
    b, h, sq, d = q.shape
    skv = k.shape[2]

    # Mosaic tiling: the lane (last) dim must be 128-aligned. BERT-family
    # head_dim is 64; zero-pad to 128 (zero q/k columns contribute nothing
    # to scores, zero v columns are sliced off the output).
    d_pad = _round_up(d, 128)
    if d_pad != d:
        dpad = ((0, 0), (0, 0), (0, 0), (0, d_pad - d))
        q = jnp.pad(q, dpad)
        k = jnp.pad(k, dpad)
        v = jnp.pad(v, dpad)

    block_q = min(block_q, _round_up(sq, 128))
    block_k = min(block_k, _round_up(skv, 128))
    sq_pad = _round_up(sq, block_q)
    skv_pad = _round_up(skv, block_k)

    needs_pad = (sq_pad != sq) or (skv_pad != skv)
    if needs_pad or (bias is None and skv_pad != skv):
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, skv_pad - skv), (0, 0)))
    if skv_pad != skv:
        # padded kv columns must be masked out
        if bias is None:
            bias = jnp.zeros((b, 1, 1, skv), jnp.float32)
        bias = jnp.pad(
            bias, ((0, 0), (0, 0), (0, 0), (0, skv_pad - skv)),
            constant_values=DEFAULT_MASK_VALUE,
        )
    if bias is not None:
        # broadcast to concrete [B, Hb, Sq_pad, Skv_pad] (Hb in {1, h})
        hb = bias.shape[1]
        bias = jnp.broadcast_to(
            bias.astype(jnp.float32), (b, hb, bias.shape[2], skv_pad)
        )
        if bias.shape[2] == 1:
            bias = jnp.broadcast_to(bias, (b, hb, sq_pad, skv_pad))
        elif bias.shape[2] != sq_pad:
            bias = jnp.pad(
                bias, ((0, 0), (0, 0), (0, sq_pad - bias.shape[2]), (0, 0))
            )

    grid = (b, h, sq_pad // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, kv_len=skv_pad
    )

    q_spec = pl.BlockSpec((1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0))
    k_spec = pl.BlockSpec((1, 1, skv_pad, d_pad), lambda bi, hi, qi: (bi, hi, 0, 0))
    in_specs = [q_spec, k_spec, k_spec]
    args = [q, k, v]
    if bias is not None:
        hb = bias.shape[1]
        if hb == 1:
            b_spec = pl.BlockSpec(
                (1, 1, block_q, skv_pad), lambda bi, hi, qi: (bi, 0, qi, 0)
            )
        else:
            b_spec = pl.BlockSpec(
                (1, 1, block_q, skv_pad), lambda bi, hi, qi: (bi, hi, qi, 0)
            )
        in_specs.append(b_spec)
        args.append(bias)
        wrapped = lambda qr, kr, vr, br, orf: kernel(
            qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], br.at[0, 0], orf.at[0, 0]
        )
    else:
        wrapped = lambda qr, kr, vr, orf: kernel(
            qr.at[0, 0], kr.at[0, 0], vr.at[0, 0], None, orf.at[0, 0]
        )

    out = pl.pallas_call(
        wrapped,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d_pad), lambda bi, hi, qi: (bi, hi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(*args)

    if sq_pad != sq or d_pad != d:
        out = out[:, :, :sq, :d]
    return out


# ---------------------------------------------------------------------------
# public entry with recompute VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret):
    return _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, bias, scale, block_q, block_k, interpret)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    q, k, v, bias = res
    # rematerialize through the XLA path: fused softmax backward, no stored
    # [Sq,Skv] activations from the forward
    def f(q, k, v, bias):
        return mha_reference(q, k, v, bias, scale)

    _, vjp = jax.vjp(f, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    if bias is None:
        dbias = None
    return dq, dk, dv, dbias


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with [B,H,S,D] layout and optional additive bias."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def default_impl() -> str:
    """Measured on v5e (B=32,H=12,S=228,D=64, bf16): XLA fused attention
    ~580us/call vs this flash kernel ~1.7ms — at BERT-scale seq lens the
    score matrix is tiny and XLA's fusion is already near-roofline, while
    the pallas grid overhead dominates. Default to XLA; flash is the right
    tool once seq lens grow (long-context stretch goal, SURVEY.md §5) or
    via MMF_TPU_ATTENTION=pallas."""
    import os

    env = os.environ.get("MMF_TPU_ATTENTION", "")
    if env in ("pallas", "xla", "pallas_interpret"):
        return env
    return "xla"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Framework-wide attention entry point. [B,H,S,D] layout.

    impl: None (auto), "pallas", "pallas_interpret" (tests), or "xla".
    dropout_rate/dropout_rng: attention-probs dropout (train only); the
    flash kernel has no probs to drop, so active dropout always routes
    through the XLA path.
    """
    if impl is None:
        impl = default_impl()
    if dropout_rate > 0.0 and dropout_rng is not None:
        return mha_reference(q, k, v, bias, scale, dropout_rate, dropout_rng)
    if impl == "xla":
        return mha_reference(q, k, v, bias, scale)
    if impl == "pallas_interpret":
        return flash_attention(q, k, v, bias, scale, interpret=True)
    return flash_attention(q, k, v, bias, scale)


def make_attention_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, Skv] {0,1} padding mask -> additive bias [B, 1, 1, Skv].

    Parity with the reference's extended attention mask ((1-m) * -10000,
    visual_bert.py:94-106) but with a proper -inf-scale constant so masked
    positions are exactly zero-probability under online softmax.
    """
    mask = mask.astype(jnp.float32)
    bias = (1.0 - mask) * DEFAULT_MASK_VALUE
    return bias[:, None, None, :].astype(dtype)


def combine_biases(*biases) -> Optional[jax.Array]:
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
