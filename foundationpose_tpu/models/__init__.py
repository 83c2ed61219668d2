from .. import jax_config  # noqa: F401
from .networks import (
    RefineNetCfg,
    ScoreNetCfg,
    init_refine_net,
    init_score_net,
    apply_refine_net,
    apply_score_net,
)
from .convert import (
    load_torch_state_dict,
    convert_refine_net,
    convert_score_net,
    detect_use_bn,
)
from .loading import load_estimator_checkpoint
from .reference_config import (
    apply_reference_defaults,
    load_reference_yaml,
    refiner_cfg_from_reference,
    scorer_cfg_from_reference,
    zfar_from_reference,
)
