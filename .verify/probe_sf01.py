import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[16]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
import __spark_entry__ as e
qs = e.queries()
SF = "/root/testdata/sf0.1"
for name in ["q_dedup_minhash", "q_star_join", "q_groupby_avg", "q_embed_topk", "q_ngram_jaccard", "q_join_nn", "q_pipeline_listings", "q_corpus_curation", "q_dedup_embed", "q_join_asof"]:
    t = time.time(); n = qs[name](spark, SF).count()
    print(f"{name}: {n} rows in {time.time()-t:.1f}s")
# idempotency probe: entry twice
r1 = e.entry(spark).collect(); r2 = e.entry(spark).collect()
print("entry idempotent:", sorted(map(str, r1)) == sorted(map(str, r2)), len(r1))
