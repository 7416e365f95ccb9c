"""Beam-reorder gather of the flat int8 self-KV cache (Pallas/TPU).

Why a kernel: beam search reorders the self-KV cache rows every step
(``decode.py::_gather_cache``).  XLA lowers the batch-axis gather on the
(L, BK, T, D) int8 arrays far off the HBM roofline — measured 20.6 ms at
batch 16 x beam 5, len 144 (tools/profile_decode.py, PERF_NOTES.md),
i.e. ~8x the ~2.5 ms the ~2 GB of read+write traffic should cost.  That
one op matched the cost of the ENTIRE rest of the decode step.

The kernel is a pure permuted copy: scalar-prefetch the (BK,) source-row
indices, and for each (layer, dest-row) grid point DMA the source row's
(T, D) int8 slab (and the (HP, T) f32 scale slab) straight through VMEM.
One pallas_call moves k, v, ks, vs together — one dispatch, four
near-memcpy streams.

Role parity: CTranslate2's beam reorder of its decoder state cache
(reference asr_core.py:159 runs beam_size=5 through CT2's decoder).
"""

from __future__ import annotations


def gather_cache_rows(k, v, ks, vs, idx, *, interpret: bool = False):
    """Reorder rows (axis 1) of the flat int8 self-KV cache.

    k, v: (L, BK, T, D) int8; ks, vs: (L, BK, HP, T) f32;
    idx: (BK,) int32 source rows.  Returns (k, v, ks, vs) with
    ``out[l, i] = in[l, idx[i]]``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, bk, t, d = k.shape
    hp = ks.shape[2]
    idx = idx.astype(jnp.int32)

    def kernel(idx_ref, k_ref, v_ref, ks_ref, vs_ref,
               ok_ref, ov_ref, oks_ref, ovs_ref):
        del idx_ref  # consumed by the index maps
        ok_ref[...] = k_ref[...]
        ov_ref[...] = v_ref[...]
        oks_ref[...] = ks_ref[...]
        ovs_ref[...] = vs_ref[...]

    def src_kv(li, bi, idx_ref):
        return (li, idx_ref[bi], 0, 0)

    def dst(li, bi, idx_ref):
        del idx_ref
        return (li, bi, 0, 0)

    kv_spec = lambda imap: pl.BlockSpec(  # noqa: E731
        (1, 1, t, d), imap, memory_space=pltpu.VMEM)
    sc_spec = lambda imap: pl.BlockSpec(  # noqa: E731
        (1, 1, hp, t), imap, memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(l, bk),
        in_specs=[kv_spec(src_kv), kv_spec(src_kv),
                  sc_spec(src_kv), sc_spec(src_kv)],
        out_specs=[kv_spec(dst), kv_spec(dst), sc_spec(dst), sc_spec(dst)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        interpret=interpret,
    )(idx, k, v, ks, vs)
