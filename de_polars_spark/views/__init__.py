from de_polars_spark.views.kpi import register_kpi_views  # noqa: F401
