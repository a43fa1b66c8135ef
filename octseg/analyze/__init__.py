from octseg.analyze.analysis import (
    calculate_object_thickness,
    calculate_thickness_contour,
    get_analysis,
)

__all__ = ['get_analysis', 'calculate_thickness_contour', 'calculate_object_thickness']
