"""Offline dataset preparation (the reference's ``data/`` scripts, L0 in SURVEY.md).

Each module is runnable as ``python -m videopose3d_tpu.data.prepare.<name>`` and
produces the same ``data_3d_<dataset>.npz`` / ``data_2d_<dataset>_<kind>.npz``
archive formats the reference consumes, so archives are interchangeable between
the two frameworks in both directions.
"""
