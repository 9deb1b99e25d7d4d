"""FeatureNet decomposition after the tap-grouped DCN kernel (round 4)."""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms

DTYPE = "bfloat16"


def t(name, fn, *args, iters=6):
    ms, comp = timed_ms(fn, *args, iters=iters, warmup=2)
    print(f"{name:<48} compile {comp:6.1f}s   run {ms:9.2f} ms", flush=True)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    from transmvsnet_tpu.models.feature_net import FeatureNet

    fnet = FeatureNet(base_channels=8, use_pallas=True)
    imgs_t = jnp.asarray(rng.rand(5, 64, 128, 3).astype(np.float32)).astype(DTYPE)
    vars_f = fnet.init(jax.random.PRNGKey(0), imgs_t, False)
    imgs = jnp.asarray(rng.rand(5, 864, 1152, 3).astype(np.float32)).astype(DTYPE)
    f = jax.jit(lambda v, x: fnet.apply(v, x, False))
    t("FeatureNet full 864x1152 x5 (tapgroup dcn)", f, vars_f, imgs)

    # Pyramid-only (conv0..conv2 + FPN laterals, no ARF heads): measure by
    # monkey-free submodule — approximate with a plain-conv FeatureNet where
    # heads are identity? Simplest honest proxy: XLA convs of the pyramid.
    from transmvsnet_tpu.models.blocks import ConvBnReLU
    import flax.linen as nn

    class PyramidOnly(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            def seq(feats, specs, name):
                for i, (features, k, s, p) in enumerate(specs):
                    feats = ConvBnReLU(features, kernel_size=k, strides=s,
                                       padding=p, name=f"{name}_{i}")(feats, train)
                return feats
            bc = 8
            conv0 = seq(x, [(bc, 3, 1, 1), (bc, 3, 1, 1)], "conv0")
            conv1 = seq(conv0, [(bc*2, 5, 2, 2), (bc*2, 3, 1, 1), (bc*2, 3, 1, 1)], "conv1")
            conv2 = seq(conv1, [(bc*4, 5, 2, 2), (bc*4, 3, 1, 1), (bc*4, 3, 1, 1)], "conv2")
            return conv0, conv1, conv2

    pyr = PyramidOnly()
    vars_p = pyr.init(jax.random.PRNGKey(0), imgs_t)
    t("pyramid convs only", jax.jit(lambda v, x: pyr.apply(v, x)), vars_p, imgs)

    # One ARF head alone at full res (the out3 head: lead conv + 3 DCN + BNs).
    from transmvsnet_tpu.models.feature_net import ARFHead

    head = ARFHead(32, 8, use_pallas=True)
    xin_t = jnp.asarray(rng.rand(5, 64, 128, 32).astype(np.float32)).astype(DTYPE)
    vh = head.init(jax.random.PRNGKey(0), xin_t, False)
    xin = jnp.asarray(rng.rand(5, 864, 1152, 32).astype(np.float32)).astype(DTYPE)
    t("ARFHead out3 (full res, 3 dcn)", jax.jit(lambda v, x: head.apply(v, x, False)), vh, xin)
    xin2 = jnp.asarray(rng.rand(5, 432, 576, 32).astype(np.float32)).astype(DTYPE)
    head2 = ARFHead(32, 16, use_pallas=True)
    vh2 = head2.init(jax.random.PRNGKey(0), xin_t, False)
    t("ARFHead out2 (1/2 res, 3 dcn)", jax.jit(lambda v, x: head2.apply(v, x, False)), vh2, xin2)
    xin1 = jnp.asarray(rng.rand(5, 216, 288, 32).astype(np.float32)).astype(DTYPE)
    head1 = ARFHead(32, 32, lead_kernel=1, use_pallas=True)
    vh1 = head1.init(jax.random.PRNGKey(0), xin_t, False)
    t("ARFHead out1 (1/4 res, 3 dcn)", jax.jit(lambda v, x: head1.apply(v, x, False)), vh1, xin1)


if __name__ == "__main__":
    main()
