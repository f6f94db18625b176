from trisk_datawrangle_spark.plans.pipelines import (  # noqa: F401
    flagship_market_share,
    yearly_revenue_series,
)
