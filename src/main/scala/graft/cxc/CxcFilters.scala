package graft.cxc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interactive filter surface (SURVEY §2.2 P13): the Spark mapping of
  * the reference dashboard's selector helpers
  * (/root/reference/dashboard/data_loader.py:121-186) — option lists
  * for the multiselect widgets plus the list-filters with the
  * reference's empty-list-means-everything contract. Declarative
  * `.isInCollection` filters, so Catalyst pushes them into the served
  * view's scan/cached relation.
  */
object CxcFilters {

  /** Sorted distinct non-null client names (get_clientes). */
  def clientes(df: DataFrame): Seq[String] = distinctOf(df, "NOMBRE_CLIENTE")

  /** Sorted distinct non-null vendor names (get_vendedores). */
  def vendedores(df: DataFrame): Seq[String] = distinctOf(df, "VENDEDOR")

  private def distinctOf(df: DataFrame, c: String): Seq[String] =
    if (!df.columns.contains(c)) Seq.empty
    else df.select(c).filter(col(c).isNotNull).distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  /** filtrar_por_cliente: empty selection returns the view unchanged. */
  def porCliente(df: DataFrame, seleccion: Seq[String]): DataFrame =
    byList(df, "NOMBRE_CLIENTE", seleccion)

  /** filtrar_por_vendedor: empty selection returns the view unchanged. */
  def porVendedor(df: DataFrame, seleccion: Seq[String]): DataFrame =
    byList(df, "VENDEDOR", seleccion)

  private def byList(df: DataFrame, c: String, sel: Seq[String]): DataFrame =
    if (sel.isEmpty || !df.columns.contains(c)) df
    else df.filter(col(c).isInCollection(sel))
}
