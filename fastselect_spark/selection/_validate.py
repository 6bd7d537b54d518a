"""Transform-time input-contract validation shared by every selector.

Reference parity: the reference's ``transform`` funnels through sklearn's
``validate_data(self, x, reset=False)`` (ReliefF.py:425-429), which raises
``ValueError("X has N features, but <Est> is expecting M features as
input.")`` on width mismatch (asserted by the reference's
tests/test_mrmr.py:183-186). The Spark analogue of "width" is the set of
fitted feature COLUMNS: a frame missing any of them gets the same
contract error (with the missing names appended) instead of an opaque
UNRESOLVED_COLUMN analysis exception deep inside a select.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def validate_transform_input(
    df: DataFrame, feature_cols: Sequence[str], estimator_name: str
) -> None:
    """Raise the reference-format ValueError when ``df`` lacks fitted
    feature columns. N counts the fitted features present, mirroring the
    reference's positional width check on a pure matrix."""
    have = set(df.columns)
    missing = [c for c in feature_cols if c not in have]
    if missing:
        n = len(feature_cols) - len(missing)
        raise ValueError(
            f"X has {n} features, but {estimator_name} is expecting "
            f"{len(feature_cols)} features as input. Missing columns: "
            f"{missing}"
        )
