import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[32]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "32").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.argv = ["x"]
from streamprocessing_with_kafka_spark.operators.text import curation_pipeline
sf = "/root/testdata/sf0.1"
for i in range(3):
    t0 = time.time()
    curation_pipeline(spark, sf).write.format("noop").mode("overwrite").save()
    print(f"run{i}: {time.time()-t0:.2f}s")
