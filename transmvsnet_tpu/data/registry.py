"""String-keyed dataset registry (reference datasets/__init__.py:5-8)."""

from __future__ import annotations

from transmvsnet_tpu.data.datasets import (
    BlendedTrainDataset,
    DTUTrainDataset,
    GeneralEvalDataset,
    TnTEvalDataset,
)
from transmvsnet_tpu.data.synthetic import SyntheticDataset

_REGISTRY = {
    "dtu": DTUTrainDataset,
    "dtu_yao": DTUTrainDataset,
    "blended": BlendedTrainDataset,
    "bld_train": BlendedTrainDataset,
    "general_eval": GeneralEvalDataset,
    "dtu_eval": GeneralEvalDataset,
    "tnt": TnTEvalDataset,
    "tnt_eval": TnTEvalDataset,
    "synthetic": SyntheticDataset,
}


def get_dataset(name: str):
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown dataset {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def register_dataset(name: str, cls) -> None:
    _REGISTRY[name] = cls
