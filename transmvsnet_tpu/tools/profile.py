"""Profiling CLI — the reference's --mode=profile analog (train.py:243-271)
rebuilt on jax.profiler: warmup iterations, then a traced window exported
for TensorBoard / Perfetto.

  python -m transmvsnet_tpu.tools.profile --logdir ./traces \
      [--train] [--height 512 --width 640]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Profile forward/train step")
    p.add_argument("--logdir", default="./traces")
    p.add_argument("--train", action="store_true", help="profile the train step")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--nviews", type=int, default=5)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--ndepths", default="48,32,8")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet

    from __graft_entry__ import _example_inputs

    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    model = TransMVSNet(ModelConfig(ndepths=ndepths))
    imgs, projs, dv = _example_inputs(
        B=args.batch_size, V=args.nviews, H=args.height, W=args.width
    )
    variables = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

    if args.train:
        from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
        from transmvsnet_tpu.train.step import create_train_state, make_train_step

        optimizer = make_optimizer(warmup_multistep(1e-3, [10000], 0.5))
        state = create_train_state(model, variables, optimizer)
        gt = jnp.zeros((args.batch_size, args.height, args.width))
        batch = {
            "imgs": imgs,
            "proj_matrices": projs,
            "depth_values": dv,
            "depth": {
                f"stage{i}": jax.image.resize(
                    gt, (args.batch_size, args.height >> (3 - i), args.width >> (3 - i)), "nearest"
                )
                for i in (1, 2, 3)
            },
            "mask": {
                f"stage{i}": jnp.ones(
                    (args.batch_size, args.height >> (3 - i), args.width >> (3 - i))
                )
                for i in (1, 2, 3)
            },
        }
        step = jax.jit(make_train_step(model, optimizer))

        def run():
            nonlocal state
            state, scalars = step(state, batch)
            return scalars["loss"]

    else:
        fwd = jax.jit(
            lambda v, i, p, d: model.apply(v, i, p, d, train=False)["depth"]
        )

        def run():
            return fwd(variables, imgs, projs, dv)

    for _ in range(args.warmup):
        jax.block_until_ready(run())

    jax.profiler.start_trace(args.logdir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(
        f"profiled {args.iters} iters in {dt:.3f}s "
        f"({dt / args.iters * 1e3:.1f} ms/iter); trace in {args.logdir}"
    )


if __name__ == "__main__":
    main()
