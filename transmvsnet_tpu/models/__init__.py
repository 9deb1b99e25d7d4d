from transmvsnet_tpu.models.transmvsnet import TransMVSNet
from transmvsnet_tpu.models.feature_net import FeatureNet
from transmvsnet_tpu.models.fmt import FMTWithPathway
from transmvsnet_tpu.models.cost_reg import CostRegNet, PixelwiseNet
