"""Offset-conv prelude: what costs 17 ms — the conv or the interleave?"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from transmvsnet_tpu.utils_bench import timed_ms
from transmvsnet_tpu.models.blocks import ConvND


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<52} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(5, 864, 1152, 32).astype(np.float32)).astype(jnp.bfloat16)

    for cout in (27, 32, 128):
        conv = ConvND(cout, 3, strides=1, padding=1)
        v = conv.init(jax.random.PRNGKey(0), x[:, :64, :128])
        t(f"bare 3x3 conv 32->{cout}", jax.jit(lambda vv, a, c=conv: c.apply(vv, a)), v, x)

    conv = ConvND(27, 3, strides=1, padding=1)
    v = conv.init(jax.random.PRNGKey(0), x[:, :64, :128])

    def prelude_t(vv, a):
        off = conv.apply(vv, a)
        off_t = off.transpose(0, 3, 1, 2)  # [B, 27, H, W]
        dy = off_t[:, 0:18:2]
        dx = off_t[:, 1:18:2]
        m = jax.nn.sigmoid(off_t[:, 18:27].astype(jnp.float32))
        return dy.astype(jnp.float32), dx.astype(jnp.float32), m

    t("conv + transpose + row slices (new prelude)", jax.jit(prelude_t), v, x)

    def interleave_only(vv, a):
        off = conv.apply(vv, a)
        o1, o2, mm = jnp.split(off, 3, axis=-1)
        cat = jnp.concatenate([o1, o2], axis=-1)
        return cat[..., 0::2], cat[..., 1::2], jax.nn.sigmoid(mm)

    t("conv + interleave split (old prelude)", jax.jit(interleave_only), v, x)


if __name__ == "__main__":
    main()
