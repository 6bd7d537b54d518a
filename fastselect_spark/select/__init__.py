from fastselect_spark.select.chi2 import chi2  # noqa: F401
from fastselect_spark.select.mi import mi_matrices, mi_pair  # noqa: F401
from fastselect_spark.select.mrmr import MRMRSelector, mrmr_select  # noqa: F401
