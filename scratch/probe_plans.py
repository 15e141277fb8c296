import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from streamprocessing_with_kafka_spark.operators import sampling, text
for name, fn in [("weighted_mix", sampling.weighted_mix),
                 ("stratified", sampling.stratified_sample),
                 ("term_df", text.term_df),
                 ("repetition", text.repetition_metrics)]:
    print("="*20, name)
    df = fn(spark, "/root/testdata/sf0.01")
    plan = df._jdf.queryExecution().explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    # print just the op tree header
    print(plan.split("\n\n")[0])
