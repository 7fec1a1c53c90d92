from thermalporous_tpu.io.balance import BalanceAuditor, format_balance
from thermalporous_tpu.io.checkpoint import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
)
from thermalporous_tpu.io.metrics import MetricsLogger
from thermalporous_tpu.io.vti import PVDWriter, state_fields, write_vti

__all__ = [
    "BalanceAuditor",
    "format_balance",
    "CheckpointManager",
    "load_checkpoint",
    "save_checkpoint",
    "MetricsLogger",
    "PVDWriter",
    "state_fields",
    "write_vti",
]
