from octseg.data.io import imread, imread_mask_tiff, imwrite, imwrite_mask_tiff

__all__ = ['imread', 'imwrite', 'imread_mask_tiff', 'imwrite_mask_tiff']
