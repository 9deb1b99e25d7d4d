"""Training CLI — the reference train.py/finetune.py surface, TPU-native.

Examples:
  # DTU from scratch (reference scripts/train.sh recipe):
  python -m transmvsnet_tpu.tools.train --dataset dtu \
      --datapath /data/dtu --trainlist lists/dtu/train.txt \
      --testlist lists/dtu/val.txt --logdir ./ckpt --epochs 16

  # BlendedMVS finetune (reference scripts/train_bld_fintune.sh):
  python -m transmvsnet_tpu.tools.train --dataset blended --loss bld \
      --lr 2e-4 --nviews 4 --batch_size 1 --loadckpt ./ckpt/dtu

  # Hermetic smoke run (no data on disk):
  python -m transmvsnet_tpu.tools.train --dataset synthetic --epochs 1
"""

from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from transmvsnet_tpu.config import MeshConfig, ModelConfig
from transmvsnet_tpu.data.loader import ShardedLoader
from transmvsnet_tpu.data.registry import get_dataset
from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.parallel.mesh import make_mesh
from transmvsnet_tpu.parallel.sharding import replicate, sharding_rules
from transmvsnet_tpu.train.checkpoint import CheckpointManager, load_weights
from transmvsnet_tpu.train.loop import MetricsLogger, run_epoch
from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
from transmvsnet_tpu.train.step import (
    create_train_state,
    make_eval_step,
    make_train_step,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="TransMVSNet-TPU training")
    p.add_argument(
        "--mode",
        default="train",
        choices=["train", "profile"],
        help="profile: run the jitted train step under jax.profiler and "
        "export a trace to <logdir>/traces (reference train.py:243-271), "
        "instead of training",
    )
    p.add_argument("--dataset", default="dtu")
    p.add_argument("--datapath", default="")
    p.add_argument("--trainlist", default="")
    p.add_argument("--testlist", default="")
    p.add_argument("--logdir", default="./checkpoints")
    p.add_argument("--loadckpt", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--epochs", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lrepochs", default="6,8,12:2")
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--nviews", type=int, default=5)
    p.add_argument("--numdepth", type=int, default=192)
    p.add_argument("--interval_scale", type=float, default=1.06)
    p.add_argument("--ndepths", default="48,32,8")
    p.add_argument("--depth_inter_r", default="4,1,0.5")
    p.add_argument("--dlossw", default="1.0,1.0,1.0")
    p.add_argument("--loss", default="cascade", choices=["cascade", "bld"])
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--summary_freq", type=int, default=50)
    p.add_argument("--save_freq", type=int, default=1)
    p.add_argument("--eval_freq", type=int, default=1)
    p.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host: call jax.distributed.initialize before anything "
        "else (auto-detects the cluster unless --coordinator is given) and "
        "shard the dataset per process, DistributedSampler-style",
    )
    p.add_argument("--coordinator", default="", help="host:port of process 0")
    p.add_argument("--num_processes", type=int, default=0, help="0 = auto")
    p.add_argument("--process_id", type=int, default=-1, help="-1 = auto")
    p.add_argument("--mesh_data", type=int, default=0, help="0 = all devices")
    p.add_argument("--mesh_view", type=int, default=1)
    p.add_argument("--mesh_depth", type=int, default=1)
    p.add_argument(
        "--no_pallas",
        action="store_true",
        help="disable the Pallas TPU kernels (they are differentiable via "
        "ops/pallas/vjp.py and on by default on TPU)",
    )
    p.add_argument(
        "--dtype",
        default="float32",
        choices=["float32", "bfloat16"],
        help="activation compute dtype (geometry/losses stay f32)",
    )
    p.add_argument(
        "--platform",
        default="",
        help="force a JAX platform (e.g. 'cpu') before device init; this "
        "image's sitecustomize force-registers the TPU plugin over "
        "JAX_PLATFORMS, so multi-process CPU launches need the explicit "
        "config override",
    )
    p.add_argument(
        "--no_remat",
        action="store_true",
        help="disable activation rematerialization in the backward pass "
        "(on by default: the DTU recipe shape does not fit HBM without it)",
    )
    return p.parse_args(argv)


def build_dataset(args, split: str):
    cls = get_dataset(args.dataset)
    listfile = args.trainlist if split == "train" else args.testlist
    kwargs = dict(
        datapath=args.datapath,
        listfile=listfile,
        mode=split,
        nviews=args.nviews,
        ndepths=args.numdepth,
    )
    if args.dataset in ("dtu", "dtu_yao"):
        kwargs["interval_scale"] = args.interval_scale
    return cls(**kwargs)


def main(argv=None):
    args = parse_args(argv)
    if args.mode == "profile":
        # The reference's --mode=profile (train.py:243-271): delegate to the
        # jax.profiler CLI with the training-recipe shape and this run's
        # cascade config; the trace lands under the run's logdir.
        from transmvsnet_tpu.tools import profile as profile_tool

        return profile_tool.main(
            [
                "--logdir", os.path.join(args.logdir, "traces"),
                "--train",
                "--batch_size", str(args.batch_size),
                "--nviews", str(args.nviews),
                "--ndepths", args.ndepths,
            ]
        )
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from transmvsnet_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=None if args.process_id < 0 else args.process_id,
        )
    np.random.seed(args.seed)

    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    ratios = tuple(float(x) for x in args.depth_inter_r.split(","))
    dlossw = tuple(float(x) for x in args.dlossw.split(","))
    model_cfg = ModelConfig(
        ndepths=ndepths,
        depth_interval_ratios=ratios,
        use_pallas=not args.no_pallas,
        compute_dtype=args.dtype,
        remat=not args.no_remat,
    )
    model = TransMVSNet(model_cfg)

    n_dev = len(jax.devices())
    data_ax = args.mesh_data or max(
        1, n_dev // (args.mesh_view * args.mesh_depth)
    )
    mesh = make_mesh(
        MeshConfig(data=data_ax, view=args.mesh_view, depth=args.mesh_depth)
    )
    global_batch = args.batch_size * mesh.shape["data"]

    # Per-process data sharding (the DistributedSampler contract,
    # reference train.py:377-384): each process loads a disjoint slice of
    # the index space and a global_batch/process_count local batch;
    # shard_batch assembles the global array across processes.
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    local_batch = global_batch // n_proc

    train_ds = build_dataset(args, "train")
    val_ds = build_dataset(args, "val") if args.dataset != "synthetic" else train_ds
    train_loader = ShardedLoader(
        train_ds,
        local_batch,
        shuffle=True,
        num_shards=n_proc,
        shard_id=jax.process_index(),
        seed=args.seed,
        drop_last=True,
    )
    val_loader = ShardedLoader(
        val_ds,
        local_batch,
        shuffle=False,
        num_shards=n_proc,
        shard_id=jax.process_index(),
        drop_last=True,
    )

    steps_per_epoch = max(len(train_loader), 1)
    milestones_epochs = [int(e) for e in args.lrepochs.split(":")[0].split(",")]
    gamma = 1.0 / float(args.lrepochs.split(":")[1])
    schedule = warmup_multistep(
        args.lr, [steps_per_epoch * e for e in milestones_epochs], gamma
    )
    optimizer = make_optimizer(schedule, weight_decay=args.wd)

    sample = train_ds[0]
    init_batch = {
        "imgs": jnp.asarray(sample["imgs"][None]),
        "proj_matrices": {
            k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()
        },
        "depth_values": jnp.asarray(sample["depth_values"][None]),
    }
    variables = model.init(
        jax.random.PRNGKey(args.seed),
        init_batch["imgs"],
        init_batch["proj_matrices"],
        init_batch["depth_values"],
        train=False,
    )
    if args.loadckpt:
        if args.loadckpt.endswith(".ckpt"):
            # Torch checkpoint (e.g. the published model_dtu.ckpt for the
            # BLD-finetune recipe, reference scripts/train_bld_fintune.sh):
            # convert transparently, same as tools/infer.py.
            from transmvsnet_tpu.convert.torch_weights import (
                convert_state_dict,
                load_torch_checkpoint,
            )

            sd = load_torch_checkpoint(args.loadckpt)
            variables = jax.tree_util.tree_map(
                jnp.asarray,
                convert_state_dict(
                    sd, jax.tree_util.tree_map(np.asarray, variables)
                ),
            )
        else:
            variables = load_weights(args.loadckpt, variables)
        print(f"loaded weights from {args.loadckpt}")
    state = create_train_state(model, variables, optimizer)

    ckpt = CheckpointManager(args.logdir)
    start_epoch = 0
    if args.resume:
        restored = ckpt.restore_latest(state)
        if restored is not None:
            state, step = restored
            start_epoch = int(step) // steps_per_epoch
            print(f"resumed from step {step} (epoch {start_epoch})")

    logger = MetricsLogger(args.logdir)
    bld = args.loss == "bld"
    train_step = jax.jit(make_train_step(model, optimizer, dlossw, bld_metrics=bld))
    eval_step = jax.jit(make_eval_step(model, dlossw, bld_metrics=bld))

    state = replicate(state, mesh)
    with mesh, sharding_rules(mesh):
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            state, train_means = run_epoch(
                train_step,
                state,
                train_loader,
                mesh=mesh,
                train=True,
                logger=logger,
                mode="train",
                log_freq=args.summary_freq,
                epoch=epoch,
            )
            print(f"epoch {epoch} train: {train_means}")
            logger.log("train_epoch", train_means, epoch)

            if (epoch + 1) % args.eval_freq == 0:
                _, val_means = run_epoch(
                    eval_step,
                    state,
                    val_loader,
                    mesh=mesh,
                    train=False,
                    logger=logger,
                    mode="val",
                    epoch=epoch,
                )
                print(f"epoch {epoch} val: {val_means}")
                logger.log("val_epoch", val_means, epoch)

            if jax.process_index() == 0 and (epoch + 1) % args.save_freq == 0:
                ckpt.save(jax.device_get(state))
    return state


if __name__ == "__main__":
    main()
