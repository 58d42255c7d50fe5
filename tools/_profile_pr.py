"""Profile PageRank superstep scaling knobs. Usage:
python tools/_profile_pr.py <cores> <shuffle> <broadcastMB> <mem>"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peregrine_spark.operators.graph import undirected
from peregrine_spark.operators.iterative import pagerank
from peregrine_spark.session import get_spark
from peregrine_spark.sources.ingest import extract_edges

cores, shuffle, bmb, mem = sys.argv[1:5]
spark = get_spark(
    master=f"local[{cores}]",
    shuffle_partitions=int(shuffle),
    extra_conf={
        "spark.sql.autoBroadcastJoinThreshold": str(int(bmb) * 1024 * 1024),
        "spark.driver.memory": mem,
    },
)
files = spark.read.parquet("data/scaling_repo_files_2000000_8.parquet")
edges = extract_edges(files).cache()
edges.count()
und = undirected(edges).cache()
und.count()
pagerank(spark, und, tol=None, max_iter=1, resume=False)  # warm
t0 = time.perf_counter()
pagerank(spark, und, tol=None, max_iter=5, resume=False)
print(f"RESULT cores={cores} shuffle={shuffle} bcast={bmb}MB mem={mem} "
      f"pr5={time.perf_counter() - t0:.1f}s")
