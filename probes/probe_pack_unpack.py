"""Probe: int32 packed-pair gather + in-kernel unpack to f32.

Scheme: word[c, j] = bf16bits(x[c, j]) | (bf16bits(x[c, j+1]) << 16).
One lane-gather at idx=x0 then yields both bilinear x-taps:
  lo_f32 = bitcast(word << 16), hi_f32 = bitcast(word & 0xffff0000).
"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def pack_pairs(x):
    """[C, W] f32 -> [C, W] int32 with (x[j], x[j+1]) as (lo, hi) bf16."""
    lo = jax.lax.bitcast_convert_type(x.astype(jnp.bfloat16), jnp.uint16)
    hi_src = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    hi = jax.lax.bitcast_convert_type(hi_src.astype(jnp.bfloat16), jnp.uint16)
    word = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)
    return word.astype(jnp.int32)


def unpack_kernel(op_ref, idx_ref, fx_ref, out_ref, *, reps):
    acc = jnp.zeros_like(out_ref)
    for r in range(reps):
        idx = (idx_ref[...] + 13 * r) % 127  # stay < W-1
        w = jnp.take_along_axis(op_ref[...], idx, axis=1)
        lo = jax.lax.bitcast_convert_type(
            jnp.left_shift(w, 16), jnp.float32
        )
        hi = jax.lax.bitcast_convert_type(
            jnp.bitwise_and(w, jnp.int32(-65536)), jnp.float32
        )
        fx = fx_ref[...]
        acc = acc + (lo * (1.0 - fx) + hi * fx)
    out_ref[...] = acc


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    C, reps = 32, 8
    x = rng.rand(C, 128).astype(np.float32) * 4 - 2
    idx = rng.randint(0, 127, size=(C, 128)).astype(np.int32)
    fx = rng.rand(C, 128).astype(np.float32)

    packed = jax.jit(pack_pairs)(jnp.asarray(x))
    f = pl.pallas_call(
        functools.partial(unpack_kernel, reps=reps),
        out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
    )
    res = np.asarray(jax.jit(f)(packed, jnp.asarray(idx), jnp.asarray(fx)))

    # Expected with bf16-rounded payloads
    xb = x.astype(np.float32)
    xbf = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    exp = np.zeros((C, 128), np.float32)
    for r in range(reps):
        ii = (idx + 13 * r) % 127
        lo = np.take_along_axis(xbf, ii, 1)
        hi = np.take_along_axis(xbf, np.minimum(ii + 1, 127), 1)
        exp += lo * (1 - fx) + hi * fx
    ok = np.allclose(res, exp, rtol=1e-5, atol=1e-5)
    print("packed-pair gather+unpack: correct =", ok)
    if not ok:
        print("max abs err:", np.abs(res - exp).max())

    # --- timing: packed (1 gather/2 taps) vs plain (2 gathers) ---
    from transmvsnet_tpu.utils_bench import timed_ms

    rows, inner = 2048, 16

    def mk_packed():
        def kern(op_ref, idx_ref, fx_ref, out_ref):
            acc = jnp.zeros((C, 128), jnp.float32)
            for r in range(inner):
                idx = (idx_ref[...] + 13 * r) % 127
                w = jnp.take_along_axis(op_ref[...], idx, axis=1)
                lo = jax.lax.bitcast_convert_type(jnp.left_shift(w, 16), jnp.float32)
                hi = jax.lax.bitcast_convert_type(
                    jnp.bitwise_and(w, jnp.int32(-65536)), jnp.float32
                )
                fx = fx_ref[...]
                acc = acc + (lo * (1.0 - fx) + hi * fx)
            out_ref[...] = acc

        return pl.pallas_call(
            kern,
            grid=(rows,),
            in_specs=[pl.BlockSpec((C, 128), lambda i: (0, 0))] * 3,
            out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        )

    def mk_plain():
        def kern(op_ref, idx_ref, fx_ref, out_ref):
            acc = jnp.zeros((C, 128), jnp.float32)
            for r in range(inner):
                idx = (idx_ref[...] + 13 * r) % 127
                lo = jnp.take_along_axis(op_ref[...], idx, axis=1)
                hi = jnp.take_along_axis(op_ref[...], idx + 1, axis=1)
                fx = fx_ref[...]
                acc = acc + (lo * (1.0 - fx) + hi * fx)
            out_ref[...] = acc

        return pl.pallas_call(
            kern,
            grid=(rows,),
            in_specs=[pl.BlockSpec((C, 128), lambda i: (0, 0))] * 3,
            out_specs=pl.BlockSpec((C, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((C, 128), jnp.float32),
        )

    fxj = jnp.asarray(fx)
    idxj = jnp.asarray(idx)
    ms, _ = timed_ms(jax.jit(mk_packed()), packed, idxj, fxj, iters=8, warmup=2)
    print(f"packed 1-gather bilinear-x: {ms:8.3f} ms  ({ms*1e6/(rows*inner):6.1f} ns/tap-pair)")
    xf = jnp.asarray(x)
    ms2, _ = timed_ms(jax.jit(mk_plain()), xf, idxj, fxj, iters=8, warmup=2)
    print(f"plain  2-gather bilinear-x: {ms2:8.3f} ms  ({ms2*1e6/(rows*inner):6.1f} ns/tap-pair)")


if __name__ == "__main__":
    main()
