from transmvsnet_tpu.data.registry import get_dataset
