#!/usr/bin/env python
"""spark-submit application file for the rollup job (north rule: "runs via
spark-submit --py-files on multi-executor clusters").

spark-submit takes a script, not a module (there is no ``-m``), so this thin
launcher is the submittable artifact; the engine itself ships as a zip:

    python - <<'PY'                     # build the --py-files artifact
    from mimirsbrunn_spark import build_pyfiles_zip
    print(build_pyfiles_zip())
    PY
    spark-submit --master <cluster> --py-files mimirsbrunn_spark_pyfiles_*.zip \
        tools/submit_rollup.py --pages <path> --out <dir> [--job-id id]

Inside the driver, ``mimirsbrunn_spark`` resolves from the --py-files zip
(spark-submit prepends it to the Python path) and ``get_spark`` detects the
submit-provided gateway, so --master/--driver-memory from the command line
win. Tested end-to-end in tests/test_spark_submit.py.
"""

from mimirsbrunn_spark.jobs.rollup_job import main

if __name__ == "__main__":
    main()
