"""Task models."""
from .pipeline import CRFStereoConfig, crf_stereo_infer  # noqa: F401
from .refiner import (  # noqa: F401
    crf_rnn_apply,
    crf_rnn_init,
    refiner_apply,
    refiner_init,
    uncertainty_apply,
    uncertainty_init,
    upsampler_apply,
    upsampler_init,
)
from .serving import StereoServer  # noqa: F401
