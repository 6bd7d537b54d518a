from fastselect_spark.select.chi2 import chi2  # noqa: F401
from fastselect_spark.select.mi import mi_matrices, mi_pair  # noqa: F401
from fastselect_spark.select.mrmr import MRMRSelector, mrmr_select  # noqa: F401
from fastselect_spark.select.relief import (  # noqa: F401
    MultiSURFSelector,
    ReliefFSelector,
    SURFSelector,
)
from fastselect_spark.select.cfs import CFSSelector  # noqa: F401
from fastselect_spark.select.mdr import MDRClassifier  # noqa: F401
from fastselect_spark.select.turf import TuRFSelector  # noqa: F401
from fastselect_spark.select.fisher import fisher_score  # noqa: F401
