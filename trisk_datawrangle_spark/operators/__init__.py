from trisk_datawrangle_spark.operators.spine import (  # noqa: F401
    complete_cross,
    complete_spine,
    missing_combinations,
)
from trisk_datawrangle_spark.operators.interpolate import (  # noqa: F401
    backfill_from_year,
    fill_locf,
    interpolate_yearly,
    lm_extrapolate,
    na_approx,
    zero_after_last,
)
from trisk_datawrangle_spark.operators.windows import (  # noqa: F401
    add_market_share_columns,
    baseline_index,
    group_max_col,
    slice_max,
    slice_min,
    with_asset_id,
    with_row_number,
)
from trisk_datawrangle_spark.operators.joins import (  # noqa: F401
    anti_join,
    bind_cols_single_row,
    closest_parent,
    natural_join,
    semi_join,
    union_with_precedence,
)
from trisk_datawrangle_spark.operators.setops import (  # noqa: F401
    clone_recode,
    union_by_name,
)
from trisk_datawrangle_spark.operators.reshape import (  # noqa: F401
    fan_out,
    melt,
    melt_year_columns,
    one_hot,
    pivot_wider,
    separate,
)
from trisk_datawrangle_spark.operators.quality import (  # noqa: F401
    assert_bounds,
    assert_no_null,
    assert_row_count,
    duplicates_report,
    incomplete_groups,
    missings_report,
    require_columns,
)
from trisk_datawrangle_spark.operators.geography import (  # noqa: F401
    containment_pairs,
    regroup_geographies,
)
