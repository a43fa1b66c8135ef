from octseg.train.losses import dice_loss_from_logits
from octseg.train.metrics import compute_metrics, save_metrics_on_epoch
from octseg.train.state import TrainState, make_optimizer

__all__ = [
    'dice_loss_from_logits',
    'compute_metrics',
    'save_metrics_on_epoch',
    'TrainState',
    'make_optimizer',
]
