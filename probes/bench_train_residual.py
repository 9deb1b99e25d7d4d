"""Break down the non-kernel (XLA) half of the 512x640 B=1 train step.

Round-4 accounting: kernels fwd 72 + bwd 164 ms of the ~517 ms step
(probes/bench_bwd_breakdown.py); the other ~280 ms — FeatureNet convs,
FMT, CostRegNetDense, PixelwiseNet backward, loss, optimizer — was
unprofiled (VERDICT r4 weak #2). This probe times each module's forward
and forward+backward (value_and_grad over its own params) standalone at
the recipe shapes, the same way the kernel half was measured.

Recipe shapes (B=1, V=5 -> BV=5 feature batch, S=4 source views):
  FeatureNet: [5, 512, 640, 3]   (includes the 9 DCN layers — subtract
              the kernel numbers for the conv residual)
  FMT:        stage feats {s1 [5,128,160,32], s2 [5,256,320,16],
              s3 [5,512,640,8]}
  CostRegDense: s1 [1,48,128,160,1] | s2 [1,32,256,320,1] | s3 [1,8,512,640,1]
  PixelwiseNet: [4, 48, 128, 160, 1]
  loss+adam:    cascade_loss pytree + optax adamw update on the param tree
"""

import os, sys

os.makedirs(".jax_cache", exist_ok=True)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.abspath(".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.utils_bench import timed_ms


def _t(fn, *args, iters=6):
    ms, _ = timed_ms(jax.jit(fn), *args, iters=iters, warmup=2)
    return ms


def main():
    print("device:", jax.devices()[0])
    rng = np.random.RandomState(0)
    rows = []

    def report(name, fwd_ms, both_ms):
        rows.append((name, fwd_ms, both_ms))
        print(
            f"{name:28s} fwd {fwd_ms:8.2f} ms   fwd+bwd {both_ms:8.2f} ms"
            f"   bwd {both_ms - fwd_ms:8.2f} ms",
            flush=True,
        )

    # --- FeatureNet (with DCN kernels + their native VJP) ---
    from transmvsnet_tpu.models.feature_net import FeatureNet

    imgs = jnp.asarray(rng.rand(5, 512, 640, 3).astype(np.float32)).astype(
        jnp.bfloat16
    )
    feat = FeatureNet(8, use_pallas=True)
    fvars = feat.init(jax.random.PRNGKey(0), imgs[:1, :64, :128], False)

    def f_fwd(v, x):
        out, _ = feat.apply(v, x, True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())

    def f_both(v, x):
        return jax.value_and_grad(lambda vv: f_fwd(vv, x))(v)

    if not os.environ.get("SKIP_FEAT"):
        report(
            "FeatureNet (incl DCN)",
            _t(f_fwd, fvars, imgs),
            _t(f_both, fvars, imgs),
        )

    # --- FMT ---
    from transmvsnet_tpu.models.fmt import FMTWithPathway

    feats = {
        "stage1": jnp.asarray(
            rng.rand(1, 5, 128, 160, 32).astype(np.float32)
        ).astype(jnp.bfloat16),
        "stage2": jnp.asarray(
            rng.rand(1, 5, 256, 320, 16).astype(np.float32)
        ).astype(jnp.bfloat16),
        "stage3": jnp.asarray(
            rng.rand(1, 5, 512, 640, 8).astype(np.float32)
        ).astype(jnp.bfloat16),
    }
    fmt = FMTWithPathway(base_channels=8, d_model=32, n_heads=8)
    mvars = fmt.init(
        jax.random.PRNGKey(0),
        {k: v[:, :, :32, :40] for k, v in feats.items()},
    )

    def m_fwd(v, x):
        out = fmt.apply(v, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())

    def m_both(v, x):
        return jax.value_and_grad(lambda vv: m_fwd(vv, x))(v)

    report("FMT", _t(m_fwd, mvars, feats), _t(m_both, mvars, feats))

    # --- CostRegNetDense per stage ---
    from transmvsnet_tpu.models.cost_reg import CostRegNetDense

    for name, D, h, w in [
        ("s1", 48, 128, 160),
        ("s2", 32, 256, 320),
        ("s3", 8, 512, 640),
    ]:
        sim = jnp.asarray(
            rng.rand(1, D, h, w, 1).astype(np.float32)
        ).astype(jnp.bfloat16)
        cr = CostRegNetDense(8)
        cvars = cr.init(jax.random.PRNGKey(0), sim[:, :, :32, :40], False)

        def c_fwd(v, x):
            out, _ = cr.apply(v, x, True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def c_both(v, x):
            return jax.value_and_grad(lambda vv: c_fwd(vv, x))(v)

        report(f"CostRegDense {name} D{D}", _t(c_fwd, cvars, sim), _t(c_both, cvars, sim))

    # --- PixelwiseNet (stage 1) ---
    from transmvsnet_tpu.models.cost_reg import PixelwiseNet

    sim1 = jnp.asarray(
        rng.rand(4, 48, 128, 160, 1).astype(np.float32)
    ).astype(jnp.bfloat16)
    pw = PixelwiseNet()
    pvars = pw.init(jax.random.PRNGKey(0), sim1[:, :, :32, :40], False)

    def p_fwd(v, x):
        out, _ = pw.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def p_both(v, x):
        return jax.value_and_grad(lambda vv: p_fwd(vv, x))(v)

    report("PixelwiseNet s1", _t(p_fwd, pvars, sim1), _t(p_both, pvars, sim1))

    # --- loss + optimizer update on the full param tree ---
    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.losses import cascade_loss
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep

    model = TransMVSNet(ModelConfig(use_pallas=True, compute_dtype="bfloat16"))
    from __graft_entry__ import _example_inputs

    t_imgs, t_projs, t_dv = _example_inputs(B=1, V=5, H=64, W=128)
    variables = model.init(jax.random.PRNGKey(0), t_imgs, t_projs, t_dv, train=False)
    params = variables["params"]
    optimizer = make_optimizer(warmup_multistep(1e-3, [10**9], 0.5))
    opt_state = optimizer.init(params)
    grads = jax.tree.map(lambda p: jnp.ones_like(p) * 1e-3, params)

    import optax

    def upd(g, p, s):
        updates, s2 = optimizer.update(g, s, p)
        return optax.apply_updates(p, updates)

    report("adam update (param tree)", 0.0, _t(upd, grads, params, opt_state))

    # loss: build stage outputs at recipe shapes
    outputs, gts, masks = {}, {}, {}
    for i, (D, h, w) in enumerate([(48, 128, 160), (32, 256, 320), (8, 512, 640)]):
        s = f"stage{i+1}"
        pv = jax.nn.softmax(
            jnp.asarray(rng.rand(1, D, h, w).astype(np.float32)), axis=1
        )
        dvs = jnp.asarray(
            np.broadcast_to(
                np.linspace(425.0, 935.0, D, dtype=np.float32)[None, :, None, None],
                (1, D, h, w),
            ).copy()
        )
        outputs[s] = {"prob_volume": pv, "depth_values": dvs}
        gts[s] = jnp.asarray(rng.uniform(425, 935, (1, h, w)).astype(np.float32))
        masks[s] = jnp.ones((1, h, w), jnp.float32)

    def loss_fn(o, g, m):
        return cascade_loss(o, g, m, (1.0, 1.0, 1.0))[0]

    report("cascade_loss fwd", _t(loss_fn, outputs, gts, masks), _t(loss_fn, outputs, gts, masks))

    tot_f = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\ncomponent totals: fwd {tot_f:.1f} ms   fwd+bwd {tot_b:.1f} ms")
    print("kernel share (r4b measured): dcn/warp fwd 72 + bwd 164 ms")


if __name__ == "__main__":
    main()
