"""Child process for the two-process multi-host training test.

Run as: python multihost_child.py <process_id> <coordinator> <outdir>

Each process initializes jax.distributed (CPU backend, 2 processes × 1
device), loads a DISJOINT shard of the synthetic dataset, and trains two
steps of a tiny model over a cross-process (data=2) mesh — the contract of
reference train.py:296-301,377-384. It writes its consumed sample indices
and a post-training parameter checksum for the parent test to verify
(disjoint data, identical replicated parameters).
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# The parent pytest process forces an 8-device host platform; each child
# here must be a single-device process.
os.environ.pop("XLA_FLAGS", None)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid = int(sys.argv[1])
    coordinator = sys.argv[2]
    outdir = sys.argv[3]

    from transmvsnet_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=coordinator, num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2 and len(jax.local_devices()) == 1

    import jax.numpy as jnp
    import numpy as np

    from transmvsnet_tpu.config import MeshConfig, ModelConfig
    from transmvsnet_tpu.data.loader import ShardedLoader
    from transmvsnet_tpu.data.synthetic import SyntheticDataset
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.parallel.mesh import make_mesh
    from transmvsnet_tpu.parallel.sharding import replicate, sharding_rules
    from transmvsnet_tpu.train.loop import run_epoch
    from transmvsnet_tpu.train.schedule import make_optimizer, warmup_multistep
    from transmvsnet_tpu.train.step import create_train_state, make_train_step

    ds = SyntheticDataset(
        mode="train", nviews=3, ndepths=16, num_samples=4, height=32, width=64
    )
    loader = ShardedLoader(
        ds, batch_size=1, num_shards=2, shard_id=pid, num_workers=0
    )
    indices = loader._shard_indices().tolist()

    model = TransMVSNet(ModelConfig(ndepths=(8, 8, 8), base_channels=8))
    sample = ds[0]
    init_batch = {
        "imgs": jnp.asarray(sample["imgs"][None]),
        "proj_matrices": {
            k: jnp.asarray(v[None]) for k, v in sample["proj_matrices"].items()
        },
        "depth_values": jnp.asarray(sample["depth_values"][None]),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        init_batch["imgs"],
        init_batch["proj_matrices"],
        init_batch["depth_values"],
        train=False,
    )
    optimizer = make_optimizer(warmup_multistep(1e-3, [100], 0.5))
    state = create_train_state(model, variables, optimizer)

    mesh = make_mesh(MeshConfig(data=2, view=1, depth=1))
    train_step = jax.jit(make_train_step(model, optimizer))
    state = replicate(state, mesh)
    with mesh, sharding_rules(mesh):
        state, means = run_epoch(train_step, state, loader, mesh=mesh, train=True)

    # Parameter checksum over the (replicated, addressable) state.
    param_sum = float(
        sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree_util.tree_leaves(state.params)
        )
    )
    result = {
        "pid": pid,
        "indices": indices,
        "loss": float(means["loss"]),
        "param_sum": param_sum,
        "step": int(state.step),
    }
    with open(os.path.join(outdir, f"out_{pid}.json"), "w") as f:
        json.dump(result, f)
    print(f"proc {pid} OK: {result}", flush=True)


if __name__ == "__main__":
    main()
