"""medpy.metric.binary work-alike (see package docstring)."""

import numpy as np
from scipy.ndimage import (binary_erosion, distance_transform_edt,
                           generate_binary_structure)


def dc(result, reference):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    intersection = np.count_nonzero(result & reference)
    size_r = np.count_nonzero(result)
    size_g = np.count_nonzero(reference)
    try:
        return 2.0 * intersection / float(size_r + size_g)
    except ZeroDivisionError:
        return 0.0


def jc(result, reference):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    intersection = np.count_nonzero(result & reference)
    union = np.count_nonzero(result | reference)
    return float(intersection) / float(union) if union else 0.0


def _surface_distances(result, reference, voxelspacing=None, connectivity=1):
    result = np.atleast_1d(result.astype(bool))
    reference = np.atleast_1d(reference.astype(bool))
    if not np.count_nonzero(result):
        raise RuntimeError(
            "The first supplied array does not contain any binary object.")
    if not np.count_nonzero(reference):
        raise RuntimeError(
            "The second supplied array does not contain any binary object.")
    footprint = generate_binary_structure(result.ndim, connectivity)
    result_border = result ^ binary_erosion(result, structure=footprint,
                                            iterations=1)
    reference_border = reference ^ binary_erosion(
        reference, structure=footprint, iterations=1)
    dt = distance_transform_edt(~reference_border, sampling=voxelspacing)
    return dt[result_border]


def hd95(result, reference, voxelspacing=None, connectivity=1):
    hd1 = _surface_distances(result, reference, voxelspacing, connectivity)
    hd2 = _surface_distances(reference, result, voxelspacing, connectivity)
    return np.percentile(np.hstack((hd1, hd2)), 95)


def asd(result, reference, voxelspacing=None, connectivity=1):
    return _surface_distances(result, reference, voxelspacing,
                              connectivity).mean()


def assd(result, reference, voxelspacing=None, connectivity=1):
    return np.mean((asd(result, reference, voxelspacing, connectivity),
                    asd(reference, result, voxelspacing, connectivity)))


def hd(result, reference, voxelspacing=None, connectivity=1):
    return max(_surface_distances(result, reference, voxelspacing,
                                  connectivity).max(),
               _surface_distances(reference, result, voxelspacing,
                                  connectivity).max())
