#!/usr/bin/env python
"""spark-submit driver script. Thin shim over logport_spark.cli so the
package itself ships only in the --py-files zip:

    spark-submit --py-files out/logport_spark.zip tools/submit_run.py \
        run --pages /data/pages --out /data/out --run-id r1

On a cluster, spark-submit distributes the zip to every executor and puts
it on the driver's sys.path; locally (no spark-submit), this also works as
a plain script as long as the zip or the repo root is importable.
"""

from __future__ import annotations

import sys

if __name__ == "__main__":
    from logport_spark.cli import main

    sys.exit(main(sys.argv[1:]))
