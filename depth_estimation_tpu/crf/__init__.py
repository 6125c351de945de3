"""Mean-field dense-CRF core (the coherent successor to the reference's
renamed/split `crf.crf` module — SURVEY.md §2.1 gotcha)."""
from .compat import charb_apply, charb_init, charbonnier, charbonnier2, potts_matrix  # noqa: F401
from .guides import ij_guide, ijrgb_guide, pixel_coords, stack_guide  # noqa: F401
from .meanfield import crf_as_rnn, mean_field_infer, mean_field_logits  # noqa: F401
