package graft.ml

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dimensionality reduction + clustering on the embedding corpus via
  * MLlib (SURVEY.md §2.2 #29/#30; reference wrapper.R:259-348 — denoised
  * PCA and graph/kmeans clustering re-expressed as distributed MLlib
  * estimators). Rows-only driver check (eigenvector sign and exact
  * cluster ids are not portable across linalg backends); semantics are
  * asserted in ScalaTest against structural invariants instead.
  */
object Reduce {

  /** 29. PCA to 8 components over the 64-d embeddings. */
  def pcaEmbeddings(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"),
        array_to_vector(col("embedding").cast("array<double>")).as("fv"))
    val model = new PCA().setK(8).setInputCol("fv").setOutputCol("pc").fit(vecs)
    // scalar columns only: the driver's pandas compare sorts every output
    // column, and a list-typed cell is unhashable there (r1 failure)
    model.transform(vecs)
      .withColumn("pcs", vector_to_array(col("pc")))
      .select(col("vec_id") +: (1 to 8).map(i =>
        round(element_at(col("pcs"), i), 4).as(s"pc$i")): _*)
  }

  /** 30. KMeans clustering (k=10, seeded) over the embeddings. */
  def kmeansClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("fv"))
    val model = new KMeans().setK(10).setSeed(42L).setFeaturesCol("fv").fit(vecs)
    model.transform(vecs)
      .select(col("vec_id"), col("label"), col("prediction").as("cluster"))
  }

  /** Hierarchical-clustering analog (wrapper.R:267-348 hclust path):
    * MLlib BisectingKMeans — divisive hierarchy, seeded. */
  def bisectingClusters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.ml.clustering.BisectingKMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"),
        array_to_vector(col("embedding").cast("array<double>")).as("fv"))
    val model = new BisectingKMeans().setK(8).setSeed(42L).setFeaturesCol("fv").fit(vecs)
    model.transform(vecs)
      .select(col("vec_id"), col("label"), col("prediction").as("cluster"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pca_embeddings"    -> (pcaEmbeddings _),
    "kmeans_clusters"   -> (kmeansClusters _),
    "bisecting_clusters" -> (bisectingClusters _))

  val oracles: Map[String, String] = Map.empty
}
