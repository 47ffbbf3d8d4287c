"""Post-processing: per-class connected-component filtering against the
registered atlas mask.

Reference: base.py:460-480. For each structure class 1..14, label the
connected components of the predicted mask and keep only the component with
the largest voxel-count overlap with the binary subcortical atlas mask —
removing spurious distant regions.

The reference has a latent bug (SURVEY.md §2.3-7): its argmax runs over the
component list *including background component 0*; when no component
overlaps the atlas, argmax returns 0 and the entire non-class region is
painted with the class label. Default behavior here is the evident intent —
score real components by atlas overlap, tie-break by size, and keep nothing
if the class is absent; ``bugcompat_argmax=True`` reproduces the reference
bit-for-bit for differential testing.
"""

from __future__ import annotations

import os

import numpy as np
from scipy import ndimage

from subcort_tpu.io import load_nii


def _filter_components(input_mask: np.ndarray, atlas_mask: np.ndarray,
                       num_classes: int, label_fn=None) -> np.ndarray:
    if label_fn is None:
        from subcort_tpu.ops.connected import label_components_np as label_fn
    filtered = np.zeros_like(input_mask)
    for l in range(1, num_classes):
        th = input_mask == l
        labels, num = label_fn(th)
        if num == 0:
            continue
        overlap_counts = np.bincount(
            labels[np.logical_and(th, atlas_mask)], minlength=num + 1)[1:]
        if overlap_counts.max(initial=0) > 0:
            winner = int(np.argmax(overlap_counts)) + 1
        else:
            # no component touches the atlas: keep the largest by size
            sizes = np.bincount(labels[th], minlength=num + 1)[1:]
            winner = int(np.argmax(sizes)) + 1
        filtered[labels == winner] = l
    return filtered


def post_process_segmentation(image_folder: str, input_mask: np.ndarray,
                              atlas_mask: np.ndarray | None = None,
                              num_classes: int = 15,
                              bugcompat_argmax: bool = False,
                              cc_backend: str = "scipy") -> np.ndarray:
    """Filter a predicted label volume; returns a new volume.

    ``atlas_mask`` may be passed directly; otherwise it is read from
    ``<image_folder>/tmp/MNI_subcortical_mask.nii.gz`` (base.py:465).

    ``cc_backend`` selects the connected-component labeler:
    ``'scipy'`` (host, default) or ``'device'`` (on-device min-label
    propagation, ops/connected.py — SURVEY.md §7-6). Both produce identical
    component *sets*; the filter's keep/drop decision is backend-invariant.
    """
    if atlas_mask is None:
        atlas_mask = load_nii(os.path.join(
            image_folder, "tmp", "MNI_subcortical_mask.nii.gz")).data
    atlas_mask = np.asarray(atlas_mask)
    if atlas_mask.dtype != np.bool_:
        atlas_mask = atlas_mask != 0

    if bugcompat_argmax:
        # reference scoring: per labeled region (INCLUDING region 0), the
        # count of voxels in th & atlas; argmax over all regions — must see
        # the full volume (the bug paints the background region).
        filtered = np.zeros_like(input_mask)
        for l in range(1, num_classes):
            th = input_mask == l
            labels, _ = ndimage.label(th)
            label_list = np.unique(labels)
            overlap = np.logical_and(th, atlas_mask)
            scores = ndimage.labeled_comprehension(
                overlap, labels, label_list, np.sum, float, 0)
            winner = label_list[int(np.argmax(scores))]
            filtered[labels == winner] = l
        return filtered

    label_fn = None
    if cc_backend == "device":
        from subcort_tpu.ops.connected import label_components_device as label_fn
    elif cc_backend != "scipy":
        raise ValueError(f"unknown cc_backend {cc_backend!r}")

    # restrict labeling to the predicted-foreground bounding box (+1 halo so
    # components never touch the crop boundary) — ~10x less ndimage.label
    # work on ROI-cropped segmentations. Per-axis any() profiles find the
    # bbox without materializing np.nonzero's index arrays (~10 ms less
    # host time per MNI-sized scan on the 1-core box).
    full = np.zeros_like(input_mask)
    sl = []
    for ax in range(input_mask.ndim):
        other = tuple(j for j in range(input_mask.ndim) if j != ax)
        idx = np.flatnonzero(input_mask.any(axis=other))
        if idx.size == 0:
            return full
        sl.append(slice(max(int(idx[0]) - 1, 0),
                        min(int(idx[-1]) + 2, input_mask.shape[ax])))
    sl = tuple(sl)
    full[sl] = _filter_components(input_mask[sl], atlas_mask[sl], num_classes,
                                  label_fn=label_fn)
    return full
