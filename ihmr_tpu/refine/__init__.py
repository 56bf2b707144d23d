from ihmr_tpu.refine.schedule import (  # noqa: F401
    MLP_DEFAULT_LOSS_WEIGHTS,
    OPT_DEFAULT_LOSS_WEIGHTS,
    PARAM_GROUP_DIMS,
    Stage,
    check_valid_loss,
    mlp_default,
    opt_default,
    strategies,
)
from ihmr_tpu.refine.mlp_engine import (  # noqa: F401
    MLPBatch,
    MLPCaches,
    apply_stage_mlp,
    make_cascade_apply,
    seed_from_backbone,
    select_better_params,
)
from ihmr_tpu.refine.escalation import (  # noqa: F401
    grid_config,
    optimize_batch_escalated,
)
from ihmr_tpu.refine.opt_engine import (  # noqa: F401
    OptBatch,
    OptConfig,
    compute_losses,
    forward,
    optimize_batch,
    params_from_init,
    params_to_handparams,
    run_stage,
)
