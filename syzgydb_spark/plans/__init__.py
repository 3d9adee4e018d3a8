from syzgydb_spark.plans.advisor import scale_report, assert_scalable  # noqa: F401
