"""Minimal stand-in for the `medpy` package (not installed in this
environment), implementing exactly the four `medpy.metric.binary`
functions the reference calls (train.py:309-320, test.py:118-129):
dc, jc, hd95, asd — with medpy's published semantics (surface voxels via
binary erosion with a connectivity-1 structuring element, Euclidean
distance transform of the complement, 95th percentile over the union of
both directed surface-distance sets).

Used only to RUN the reference for baseline/parity measurement and as a
cross-check oracle in tests; the framework's own eval path uses
ust_run_tpu.utils.boundary / native/boundary.cc.
"""
