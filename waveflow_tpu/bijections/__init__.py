from waveflow_tpu.bijections.core import (
    ActNorm, AffineCoupling, AffineCouplingSplit, BatchNorm,
    FixedInvertibleLinear, Invert, InvertibleLinear, Logit, MADE, Reverse,
    Serial, Shuffle, Sigmoid, batchnorm_update_stats,
)
from waveflow_tpu.bijections.imade import IMADE
from waveflow_tpu.bijections.box_transform import BoxTransformLayer
from waveflow_tpu.bijections.masks import (
    made_masks, masked_mlp, masked_conditioner, simple_masked_transform,
)
from waveflow_tpu.bijections.rqs import (
    NeuralSplineCoupling, rational_quadratic_spline,
)
