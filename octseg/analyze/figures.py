"""Analytics figures: object presence map, area traces, area boxplots, frame
viewer composite.

Functional parity with the reference plotly figures (reference:
src/app/tools/plotly_analytics.py:7-175 and img_viewer.py:13-97), rendered
with matplotlib (plotly is not available in this environment): same grouping
semantics — per-class instance runs split on object_id change, traces/boxes
only for instances spanning ≥3 frames — and the same class colors.
"""

from __future__ import annotations

import base64
from io import BytesIO
from typing import Dict, List, Optional

import matplotlib

matplotlib.use('Agg')
# the pyplot state machine (Gcf figure registry, current-figure pointer) is
# NOT thread-safe and these endpoints run concurrently in the web app's
# handler threads — use the object-oriented API only
from matplotlib.figure import Figure  # noqa: E402
import numpy as np  # noqa: E402
from PIL import Image  # noqa: E402

from octseg.core.registry import CLASS_COLORS_RGB, CLASS_IDS_REVERSED  # noqa: E402


def _color(class_name: str):
    return tuple(c / 255 for c in CLASS_COLORS_RGB[class_name])


def _instance_runs(obj: Dict[str, list], with_area: bool = False) -> List[list]:
    """Split a class's per-frame records into instance runs (object_id
    change boundaries, ref plotly_analytics.py:17-29)."""
    runs: List[list] = []
    if not obj['object_id']:
        return runs
    current_id = obj['object_id'][0]
    run: list = []
    for idx, oid in enumerate(obj['object_id']):
        item = (obj['slice'][idx], obj['area'][idx]) if with_area else obj['slice'][idx]
        if oid == current_id:
            run.append(item)
        else:
            runs.append(run)
            run = [item]
            current_id = oid
    runs.append(run)
    return runs


def _figure(figsize):
    fig = Figure(figsize=figsize)
    return fig, fig.subplots()


def fig_to_png_bytes(fig) -> bytes:
    buff = BytesIO()
    fig.savefig(buff, format='png', dpi=110, bbox_inches='tight')
    return buff.getvalue()  # no pyplot registry: the figure just gets GC'd


def get_object_map(data: Dict) -> bytes:
    """Per-class object presence across slices."""
    fig, ax = _figure((9, 2.5))
    for class_name, obj in data['objects'].items():
        for run in _instance_runs(obj):
            ax.plot(run, [class_name] * len(run), marker='o', markersize=3,
                    linewidth=2, color=_color(class_name))
    ax.set_xlabel('Slice')
    ax.set_xlim(left=0)
    fig.tight_layout()
    return fig_to_png_bytes(fig)


def get_trace_area(classes: List[str], data: Dict) -> bytes:
    """Area vs slice per object instance (instances spanning >= 3 frames)."""
    fig, ax = _figure((9, 3.5))
    for class_name, obj in data['objects'].items():
        if class_name not in classes:
            continue
        for run in _instance_runs(obj, with_area=True):
            if len(run) >= 3:
                arr = np.array(run)
                ax.plot(arr[:, 0], arr[:, 1], color=_color(class_name),
                        label=class_name)
    ax.set_xlabel('Samples')
    ax.set_ylabel('Area')
    fig.tight_layout()
    return fig_to_png_bytes(fig)


def get_plot_area(classes: List[str], data: Dict) -> bytes:
    """Per-instance area boxplots (instances spanning >= 3 frames)."""
    fig, ax = _figure((9, 3.5))
    boxes, labels, colors = [], [], []
    for class_name, obj in data['objects'].items():
        if class_name not in classes:
            continue
        for i, run in enumerate(_instance_runs(obj, with_area=True), 1):
            if len(run) >= 3:
                boxes.append([a for _s, a in run])
                labels.append(f'{class_name}, {i}')
                colors.append(_color(class_name))
    if boxes:
        bp = ax.boxplot(boxes, tick_labels=labels, patch_artist=True)
        for patch, c in zip(bp['boxes'], colors):
            patch.set_facecolor(c)
    ax.set_xlabel('Objects')
    ax.set_ylabel('Area')
    for tick in ax.get_xticklabels():
        tick.set_rotation(30)
        tick.set_horizontalalignment('right')
    fig.tight_layout()
    return fig_to_png_bytes(fig)


def get_img_show(
    data: Dict,
    img_dir: str,
    img_num: int = 0,
    classes_vis: Optional[List[str]] = None,
    opacity: float = 20,
) -> bytes:
    """Side-by-side frame view: original with translucent class fills, and a
    gray canvas with opaque fills (ref img_viewer.py layout)."""
    alpha = opacity * 0.01
    img = Image.open(f"{img_dir}/{data['images'][img_num]}.png").convert('RGB')
    w, h = img.size
    canvas = Image.new('RGB', (w * 2, h))
    right = Image.new('RGB', (w, h), color=(128, 128, 128))
    left = img.copy()
    classes_vis = classes_vis if classes_vis is not None else list(CLASS_IDS_REVERSED.values())
    for class_id, class_name in CLASS_IDS_REVERSED.items():
        if class_name not in classes_vis:
            continue
        obj = data['objects'][class_name]
        if img_num not in obj['slice']:
            continue
        i = obj['slice'].index(img_num)
        mask = np.array(Image.open(BytesIO(base64.b64decode(obj['masks'][i]))))
        color_img = Image.new('RGB', (w, h), color=CLASS_COLORS_RGB[class_name])
        solid = Image.fromarray(mask).convert('L')
        translucent = Image.fromarray((mask > 0).astype(np.uint8) * int(255 * (1 - alpha))
                                      ).convert('L')
        left.paste(color_img, (0, 0), translucent)
        right.paste(color_img, (0, 0), solid)
    canvas.paste(left, (0, 0))
    canvas.paste(right, (w, 0))
    buff = BytesIO()
    canvas.save(buff, format='png')
    return buff.getvalue()
