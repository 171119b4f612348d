from gcge_tpu.utils.cli import params_from_args, print_usage
from gcge_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["params_from_args", "print_usage", "save_checkpoint", "load_checkpoint"]
