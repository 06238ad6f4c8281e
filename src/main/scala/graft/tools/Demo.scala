package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{functions => F}

import graft.core.TableFrame
import graft.flow.FlowEngine
import graft.sources.FileSink
import graft.store.{TableRef, TableStore}
import graft.td

/** End-to-end demo of the pub/sub engine through the public API — the
  * Spark analog of the reference's csv-publisher → transformer → subscriber
  * example (testing_resources/test_input_file_csv_modified_format). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = td.session("local[8]", 8)
    val sf = "/root/testdata/sf0.001"
    val storeDir = Files.createTempDirectory("graft-demo-store").toString
    val outDir = Files.createTempDirectory("graft-demo-out").toString
    val store = new TableStore(storeDir, spark)
    val engine = new FlowEngine(store, spark)

    engine.publisher("pub_orders", "sales", Seq("orders_raw")) { _ =>
      Seq(TableFrame.fromRaw(spark.read.parquet(s"$sf/orders.parquet")))
    }
    engine.transformer("seg_revenue", "sales", Seq("orders_raw"), Seq("by_status")) { ctx =>
      Seq(ctx.input(0)
        .group_by("o_orderstatus")
        .agg(td.col("o_totalprice").sum.as("revenue"), td.lit(1).len.as("n")))
    }
    engine.subscriber("sub_jsonl", "sales", Seq("by_status")) { ctx =>
      FileSink(s"$outDir/by_status", "jsonl").write(
        ctx.input(0).selectCols("o_orderstatus", "revenue", "n").df)
      Seq.empty
    }

    println("RAN: " + engine.trigger("pub_orders").mkString(" -> "))
    println("RAN: " + engine.trigger("pub_orders").mkString(" -> "))
    println("versions(by_status): " + store.versions("sales", "by_status").map(_.id).mkString(", "))
    println("HEAD rows:")
    store.scan("sales/by_status").get.df.show(5, false)
    println("HEAD^ == HEAD counts: " +
      (store.scan("sales/by_status@HEAD^").get.count() ==
        store.scan("sales/by_status").get.count()))
    println("sample(offset=1,len=2):")
    store.sample(TableRef.parse("sales/by_status"), 1, 2).get.show(false)
    println("subscriber jsonl output:")
    spark.read.json(s"$outDir/by_status").show(5, false)
    // probes
    try store.scan("sales/by_status@NOPE")
    catch { case e: IllegalArgumentException => println("PROBE bad selector -> " + e.getMessage) }
    println("PROBE missing table -> " + store.scan("sales/nothing"))
    try engine.trigger("ghost")
    catch { case e: IllegalArgumentException => println("PROBE unknown function -> " + e.getMessage) }
    spark.stop()
  }
}
