package graft

import java.sql.DriverManager
import java.util.Properties
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.sources.SqlImport
import graft.sources.SqlImport._

/** SQL import (reference experimental/sql_import.py): JDBC tables →
  * declarative mapping → graph, verified by traversing the result.
  * Uses embedded Derby — a real JDBC source in-process. */
class SqlImportSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val dbUrl: String = {
    // keep derby.log out of the working tree (Derby writes it to CWD by
    // default; must be set before the embedded driver initializes)
    System.setProperty("derby.stream.error.file",
      System.getProperty("java.io.tmpdir") + "/graft-derby.log")
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE PERSON (ID INT PRIMARY KEY, NAME VARCHAR(64), AGE INT, VIP BOOLEAN)")
    st.execute("CREATE TABLE PET (ID INT PRIMARY KEY, PNAME VARCHAR(64), OWNER_ID INT)")
    st.execute("INSERT INTO PERSON VALUES (1, 'Ann', 31, true), (2, 'Bob', 45, false), (3, 'Cid', 22, false)")
    st.execute("INSERT INTO PET VALUES (10, 'Spot', 1), (11, 'Rex', 1), (12, 'Tom', 2)")
    st.close(); conn.close()
    url
  }

  private def props: Properties = {
    val p = new Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("JDBC tables -> declarative mapping -> graph -> traversals") {
    val mapping = Mapping(
      entities = Seq(
        EntityMap("PERSON", "Person", "ID", Seq("NAME", "AGE", "VIP")),
        EntityMap("PET", "Pet", "ID", Seq("PNAME"))),
      relations = Seq(
        RelationMap("PET", "HasPet", "Person", "OWNER_ID", "Pet", "ID")))
    val g = SqlImport.importGraph(spark, dbUrl, mapping, props)

    val people = g.now.all("Person")
    assert(people.count() == 3)
    // typed values survive the JDBC schema: string, long, boolean
    val ann = g.now.all("Person").df.filter(col("atom_id") === "e:Person/1")
    val annSet = AtomSet(g.now, ann)
    assert(annSet.fieldValue("NAME", "v_str", "n")
      .collect()(0).getAs[String]("n") == "Ann")
    assert(annSet.fieldValue("AGE", "v_long", "a")
      .collect()(0).getAs[Long]("a") == 31L)
    assert(annSet.fieldValue("VIP", "v_bool", "v")
      .collect()(0).getAs[Boolean]("v"))
    // FK relation: Ann has two pets, Bob one, Cid none
    assert(annSet.outs("HasPet").count() == 2)
    assert(people.hasOut("HasPet").count() == 2)
    val petNames = annSet.outs("HasPet").fieldValue("PNAME", "v_str", "p")
      .collect().map(_.getAs[String]("p")).sorted
    assert(petNames.toSeq == Seq("Rex", "Spot"))
    // reverse traversal: pet -> owner
    val rex = AtomSet(g.now, g.atoms.filter(col("atom_id") === "e:Pet/11"))
    assert(rex.ins("HasPet").df.select("atom_id")
      .collect()(0).getString(0) == "e:Person/1")
  }

  test("relations-only mapping imports; cross-entry key overlap rejects loudly") {
    // relations-only used to throw empty.reduce on the values union
    val relOnly = Mapping(entities = Nil, relations =
      Seq(RelationMap("PET", "HasPet", "Person", "OWNER_ID", "Pet", "ID")))
    val g = SqlImport.importGraph(spark, dbUrl, relOnly, props)
    assert(g.atoms.filter(col("atype") === "HasPet").count() == 3)
    assert(g.values.count() == 0)
    // two entries mapping the SAME entity type with overlapping keys used
    // to pass both per-table checks and silently duplicate every value row
    // under the single-assignment stamp
    val overlapping = Mapping(entities = Seq(
      EntityMap("PERSON", "Person", "ID", Seq("NAME")),
      EntityMap("PERSON", "Person", "ID", Seq("NAME"))))
    val ex = intercept[IllegalArgumentException] {
      SqlImport.importGraph(spark, dbUrl, overlapping, props)
    }
    assert(ex.getMessage.contains("colliding ae_ids"))
    // and an empty mapping is a usable error, not empty.reduce
    intercept[IllegalArgumentException] {
      SqlImport.importGraph(spark, dbUrl, Mapping(Nil, Nil), props)
    }
    // a SINGLE entry with a duplicated fieldCol also rejects: the ae_id
    // check used to run only for size > 1, so one EntityMap emitting two
    // identical value rows per entity was stamped single-assignment and
    // latestValues' filter-only fast path returned both
    val dupField = Mapping(entities = Seq(
      EntityMap("PERSON", "Person", "ID", Seq("NAME", "NAME"))))
    val exDup = intercept[IllegalArgumentException] {
      SqlImport.importGraph(spark, dbUrl, dupField, props)
    }
    assert(exDup.getMessage.contains("colliding ae_ids"), exDup.getMessage)
  }

  test("partitioned JDBC read produces the same graph") {
    val mapping = Mapping(
      entities = Seq(EntityMap("PERSON", "Person", "ID", Seq("NAME"),
        partition = Some(JdbcPartition("ID", 1, 3, 2)))))
    val g = SqlImport.importGraph(spark, dbUrl, mapping, props)
    assert(g.now.all("Person").count() == 3)
    val names = g.now.all("Person").fieldValue("NAME", "v_str", "n")
      .collect().map(_.getAs[String]("n")).sorted
    assert(names.toSeq == Seq("Ann", "Bob", "Cid"))
  }
}
