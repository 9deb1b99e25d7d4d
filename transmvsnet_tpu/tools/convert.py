"""Convert a reference PyTorch checkpoint to native orbax weights.

  python -m transmvsnet_tpu.tools.convert --ckpt model_dtu.ckpt --out ./weights_dtu
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="torch ckpt -> orbax weights")
    p.add_argument("--ckpt", required=True, help="reference .ckpt path")
    p.add_argument("--out", required=True, help="output weights directory")
    p.add_argument("--ndepths", default="48,32,8")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from transmvsnet_tpu.config import ModelConfig
    from transmvsnet_tpu.convert.torch_weights import (
        convert_state_dict,
        load_torch_checkpoint,
    )
    from transmvsnet_tpu.models.transmvsnet import TransMVSNet
    from transmvsnet_tpu.train.checkpoint import save_weights

    from __graft_entry__ import _example_inputs

    ndepths = tuple(int(x) for x in args.ndepths.split(","))
    model = TransMVSNet(ModelConfig(ndepths=ndepths))
    imgs, projs, dv = _example_inputs(B=1, V=3, H=64, W=128, num_hyp=192)
    template = model.init(jax.random.PRNGKey(0), imgs, projs, dv, train=False)

    sd = load_torch_checkpoint(args.ckpt)
    variables = convert_state_dict(
        sd, jax.tree_util.tree_map(np.asarray, template)
    )
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    save_weights(args.out, variables)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {n:,} parameters -> {args.out}")


if __name__ == "__main__":
    main()
