"""`python -m pmacct_spark.client -c src_host,dst_host -s` — the
pmacct client binary surface over the Spark-served table."""

import sys

from pmacct_spark.client.cli import main

if __name__ == "__main__":
    print(main(sys.argv[1:]))
