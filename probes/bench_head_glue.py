"""Decompose the ARFHead glue: kernels vs transposes/BN/offset-conv."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms
from transmvsnet_tpu.ops.pallas.dcn_onehot import deform_conv2d_onehot


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<48} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    H, W, C = 864, 1152, 32
    x = jnp.asarray(rng.rand(5, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    dy = jnp.asarray((rng.rand(5, H, W, 9) - 0.5).astype(np.float32))
    dx = jnp.asarray((rng.rand(5, H, W, 9) - 0.5).astype(np.float32))
    m = jnp.asarray(rng.rand(5, H, W, 9).astype(np.float32))
    w = jnp.asarray(rng.randn(9, C, C).astype(np.float32) * 0.1)

    # 3 chained kernels, offsets reused (isolates kernel+inter-kernel layout).
    def chain3(x, dy, dx, m, w):
        y = deform_conv2d_onehot(x, dy, dx, m, w)
        y = deform_conv2d_onehot(y, dy, dx, m, w)
        return deform_conv2d_onehot(y, dy, dx, m, w)

    t("3 chained dcn kernels (no bn/offconv)", jax.jit(chain3), x, dy, dx, m, w)

    # One kernel alone for reference.
    t("1 dcn kernel", jax.jit(lambda *a: deform_conv2d_onehot(*a)), x, dy, dx, m, w)

    # Offset conv + interleave split + sigmoid (the DCN module's prelude).
    import flax.linen as nn
    from transmvsnet_tpu.models.blocks import ConvND

    class OffPrelude(nn.Module):
        @nn.compact
        def __call__(self, x):
            off = ConvND(27, 3, strides=1, padding=1, name="conv_offset_mask")(x)
            o1, o2, mm = jnp.split(off, 3, axis=-1)
            cat = jnp.concatenate([o1, o2], axis=-1)
            return cat[..., 0::2], cat[..., 1::2], jax.nn.sigmoid(mm)

    op = OffPrelude()
    vo = op.init(jax.random.PRNGKey(0), x[:, :64, :128])
    t("offset conv + interleave split + sigmoid", jax.jit(lambda v, a: op.apply(v, a)), vo, x)

    # BN + relu pass at head width.
    from transmvsnet_tpu.models.blocks import BatchNorm

    bn = BatchNorm(C)
    vb = bn.init(jax.random.PRNGKey(0), x[:, :64, :128], False)
    t("bn+relu (one pass)", jax.jit(lambda v, a: nn.relu(bn.apply(v, a, False))), vb, x)

    # Transpose pair cost (kernel layout round trip).
    def tp(a):
        b = a.transpose(0, 1, 3, 2)
        return b.transpose(0, 1, 3, 2) * 1.000001

    t("transpose pair [B,H,W,C]<->[B,H,C,W]", jax.jit(tp), x)


if __name__ == "__main__":
    main()
