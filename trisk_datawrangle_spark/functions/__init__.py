from trisk_datawrangle_spark.functions.scalars import (  # noqa: F401
    all_null,
    any_null,
    exact_cents_sum,
    recode,
    replace_na,
    row_sum,
    safe_div,
    unite,
    UNIT,
)
from trisk_datawrangle_spark.functions.aggregates import (  # noqa: F401
    arg_max,
    arg_min,
    bool_all,
    bool_any,
    collect_sorted_csv,
    median,
    sum_or_null,
)
