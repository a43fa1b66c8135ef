from octseg.ops.resize import resize_bilinear, resize_nearest
from octseg.ops.normalize import normalize_imagenet, sigmoid_threshold

__all__ = [
    'resize_bilinear',
    'resize_nearest',
    'normalize_imagenet',
    'sigmoid_threshold',
]
