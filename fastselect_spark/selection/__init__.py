from fastselect_spark.selection.chi2 import chi2  # noqa: F401
from fastselect_spark.selection.mi import (  # noqa: F401
    gain_ratio,
    mi_matrices,
    mi_pair,
)
from fastselect_spark.selection.mrmr import MRMRSelector, mrmr_select  # noqa: F401
from fastselect_spark.selection.relief import (  # noqa: F401
    MultiSURFSelector,
    ReliefFSelector,
    SURFSelector,
)
from fastselect_spark.selection.cfs import CFSSelector  # noqa: F401
from fastselect_spark.selection.mdr import MDRClassifier  # noqa: F401
from fastselect_spark.selection.turf import TuRFSelector  # noqa: F401
from fastselect_spark.selection.fisher import fisher_score  # noqa: F401
from fastselect_spark.selection.jmi import JMISelector, jmi_select  # noqa: F401
from fastselect_spark.selection.cmim import CMIMSelector, cmim_select  # noqa: F401
from fastselect_spark.selection.fcbf import FCBFSelector, fcbf_select  # noqa: F401
from fastselect_spark.selection.univariate import (  # noqa: F401
    anova_f_score,
    f_regression_scores,
    feature_variances,
    mad_outliers,
    mad_stats,
    quantile_clip,
    quantile_discretize,
    quantile_stats,
    robust_scale,
    robust_scaler_stats,
    standard_scale,
    standard_scaler_stats,
    dispersion_ratios,
    uniform_discretize,
    variance_threshold,
)
from fastselect_spark.selection.fdr import fdr_bh  # noqa: F401
from fastselect_spark.selection.rank import (  # noqa: F401
    auc_scores,
    average_ranks_long,
    quantile_normalize,
)
from fastselect_spark.selection.categorical import (  # noqa: F401
    categorical_associations,
)
from fastselect_spark.selection.correlation import (  # noqa: F401
    kendall_tau_matrix,
)
from fastselect_spark.selection.multivariate import (  # noqa: F401
    close_mahalanobis_stats,
    mahalanobis_distance,
    mahalanobis_stats,
)
from fastselect_spark.selection.pipeline import scores_from_cube  # noqa: F401
from fastselect_spark.selection.matrix import (  # noqa: F401
    BroadcastMIEngine,
    chi2_matrix,
    cmim_select_matrix,
    encode_shared,
    fisher_matrix,
    jmi_select_matrix,
    matrix_table,
    mi_matrices_broadcast,
    mi_relevance_matrix,
    mrmr_select_matrix,
)
from fastselect_spark.selection.stability import (  # noqa: F401
    chi2_fold_scores,
    stability_topk,
)
from fastselect_spark.selection.stump import stump_gain_scores  # noqa: F401
from fastselect_spark.selection.leakage import (  # noqa: F401
    leakage_audit,
    leakage_audit_df,
)
