from .laketable import LakeTable, MergeStats  # noqa: F401
