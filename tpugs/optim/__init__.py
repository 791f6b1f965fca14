from tpugs.optim.adam import AdamConfig, AdamState, adam_init, adam_step
from tpugs.optim.lr_schedule import (
    active_sh_degree_for_step,
    position_lr,
    PositionLRConfig,
)
