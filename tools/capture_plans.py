"""Capture executedPlan evidence for docs/PLANS.md §round-2 operators.

Usage: python tools/capture_plans.py >> docs/PLANS.md  (then edit)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    qs = em.queries()
    for name in sys.argv[1:] or ["w_dismax", "q_phrase_sloppy",
                                 "t_minhash_lsh", "v_embed_lsh",
                                 "q_block_join"]:
        df = qs[name](spark, SF)
        print(f"\n### plan: {name}\n")
        print("```")
        txt = explain_str(df)
        print(txt[:4000])
        print("```")
    spark.stop()


if __name__ == "__main__":
    main()
