package graft.core

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("registered views serve SQL queries with correct event-time types") {
    Catalog.registerAll(spark, sf)
    assert(Catalog.listTables(spark).toSet.intersect(Catalog.tableNames.toSet) == Catalog.tableNames.toSet)
    val r = spark
      .sql("""SELECT event_type, count(*) AS n, date_trunc('hour', min(ts)) AS first_hour
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
      .collect()
    assert(r.length == 5)
    assert(r.forall(!_.isNullAt(2))) // ts is a real timestamp in SQL
    // a join through SQL over the views
    val j = spark
      .sql("""SELECT n_name, count(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey
              |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .count()
    assert(j > 0)
  }
}
