"""spark-submit launcher (BASELINE.json: "packaged for spark-submit
--py-files on multi-executor clusters").

spark-submit needs a *file* as the application entry (it has no ``-m``),
and running ``engine/__main__.py`` by path breaks the package's relative
imports. This thin launcher is that file: ship the package as a zip via
``--py-files`` (spark-submit puts it on sys.path for the driver AND every
executor, so the Arrow-UDF closures can unpickle engine.* remotely):

    zip -r engine.zip engine
    spark-submit --master <...> --py-files engine.zip submit.py \
        build --input <parquet | table:cat.db.tbl | synthetic> \
        --index-dir hdfs:///path/idx
    spark-submit ... submit.py search --index-dir ... --query "a b" --k 10
    spark-submit ... submit.py search-batch --index-dir ... \
        --queries-file qset.json

Exercised end-to-end (local[8], zip-only sys.path, cwd outside the repo)
by tests/test_submit.py. Local dev: ``python -m engine <cmd> ...``.
"""

import sys

from engine.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
