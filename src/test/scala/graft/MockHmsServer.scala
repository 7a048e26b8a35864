package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.MetaStoreEventListener
import org.apache.hadoop.hive.metastore.api.{
  Database, NoSuchObjectException, Partition, Table, ThriftHiveMetastore}
import org.apache.hadoop.hive.metastore.events._
import org.apache.thrift.protocol.TBinaryProtocol
import org.apache.thrift.server.TThreadPoolServer
import org.apache.thrift.transport.TServerSocket

import graft.catalog.{InMemoryCatalog, ThriftHmsCatalogClient}
import graft.model.PartitionName

/**
 * In-process mock Hive metastore speaking REAL Thrift: the huge
 * generated `ThriftHiveMetastore.Iface` is implemented by a
 * `reflect.Proxy` that delegates the handful of RPCs the replication
 * engine uses to an [[InMemoryCatalog]] and fails loudly on anything
 * else — the counterpart of the reference's `MockHiveMetastoreClient`,
 * but exercised over an actual socket + TBinaryProtocol round-trip so
 * the client's wire serialization is covered too.
 */
final class MockHmsServer(val cat: InMemoryCatalog,
    listeners: Seq[MetaStoreEventListener] = Seq.empty) {

  /** Fire a listener event AFTER the successful mutation, like the real
    * HMSHandler's non-transactional listener dispatch. */
  private def fire(e: ListenerEvent): Unit = listeners.foreach { l =>
    e match {
      case ev: CreateTableEvent => l.onCreateTable(ev)
      case ev: DropTableEvent => l.onDropTable(ev)
      case ev: AlterTableEvent => l.onAlterTable(ev)
      case ev: AddPartitionEvent => l.onAddPartition(ev)
      case ev: DropPartitionEvent => l.onDropPartition(ev)
      case ev: AlterPartitionEvent => l.onAlterPartition(ev)
      case ev: CreateDatabaseEvent => l.onCreateDatabase(ev)
      case ev: DropDatabaseEvent => l.onDropDatabase(ev)
      case _ => ()
    }
  }

  private def thriftTable(db: String, tbl: String): Table =
    cat.getTable(db, tbl).map(ThriftHmsCatalogClient.toThriftTable)
      .getOrElse(throw new NoSuchObjectException(s"$db.$tbl"))

  private def partName(db: String, tbl: String,
      values: java.util.List[String]): String = {
    val keys = cat.getTable(db, tbl).getOrElse(
      throw new NoSuchObjectException(s"$db.$tbl")).partitionKeys.map(_.name)
    PartitionName.render(keys.zip(values.asScala.toSeq))
  }

  private val handler = new InvocationHandler {
    def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef = {
      def db = args(0).asInstanceOf[String]
      def tbl = args(1).asInstanceOf[String]
      method.getName match {
        case "get_all_databases" =>
          new java.util.ArrayList[String](cat.listDatabases().asJava)
        case "create_database" =>
          cat.createDatabase(args(0).asInstanceOf[Database].getName)
          fire(new CreateDatabaseEvent(args(0).asInstanceOf[Database], true, null))
          null
        case "get_all_tables" =>
          new java.util.ArrayList[String](cat.listTables(db).asJava)
        case "get_table" =>
          cat.getTable(db, tbl).map(ThriftHmsCatalogClient.toThriftTable)
            .getOrElse(throw new NoSuchObjectException(s"$db.$tbl"))
        case "create_table" =>
          cat.createTable(ThriftHmsCatalogClient.fromThriftTable(
            args(0).asInstanceOf[Table]))
          fire(new CreateTableEvent(args(0).asInstanceOf[Table], true, null))
          null
        case "alter_table" =>
          val oldT = thriftTable(db, tbl)
          cat.alterTable(db, tbl, ThriftHmsCatalogClient.fromThriftTable(
            args(2).asInstanceOf[Table]))
          fire(new AlterTableEvent(oldT, args(2).asInstanceOf[Table], true, null))
          null
        case "drop_table" =>
          val dropped = thriftTable(db, tbl)
          cat.dropTable(db, tbl)
          fire(new DropTableEvent(dropped, true, false, null))
          null
        case "get_partition_names" =>
          new java.util.ArrayList[String](
            cat.listPartitionNames(db, tbl).asJava)
        case "get_partition_by_name" =>
          val name = args(2).asInstanceOf[String]
          cat.getPartition(db, tbl, name)
            .map(ThriftHmsCatalogClient.toThriftPartition)
            .getOrElse(throw new NoSuchObjectException(s"$db.$tbl/$name"))
        case "add_partition" =>
          val p = args(0).asInstanceOf[Partition]
          val name = partName(p.getDbName, p.getTableName, p.getValues)
          cat.addPartition(ThriftHmsCatalogClient.fromThriftPartition(p, name))
          fire(new AddPartitionEvent(
            thriftTable(p.getDbName, p.getTableName), p, true, null))
          p
        case "alter_partition" =>
          val p = args(2).asInstanceOf[Partition]
          val name = partName(db, tbl, p.getValues)
          val oldP = cat.getPartition(db, tbl, name)
            .map(ThriftHmsCatalogClient.toThriftPartition)
            .getOrElse(throw new NoSuchObjectException(s"$db.$tbl/$name"))
          cat.alterPartition(
            ThriftHmsCatalogClient.fromThriftPartition(p, name))
          fire(new AlterPartitionEvent(oldP, p, thriftTable(db, tbl), true, null))
          null
        case "drop_partition_by_name" =>
          val name = args(2).asInstanceOf[String]
          val dropped = cat.getPartition(db, tbl, name)
            .map(ThriftHmsCatalogClient.toThriftPartition)
            .getOrElse(throw new NoSuchObjectException(s"$db.$tbl/$name"))
          cat.dropPartition(db, tbl, name)
          fire(new DropPartitionEvent(thriftTable(db, tbl), dropped, true,
            false, null))
          java.lang.Boolean.TRUE
        case "rename_partition" =>
          val fromVals = args(2).asInstanceOf[java.util.List[String]]
          val to = args(3).asInstanceOf[Partition]
          val fromName = partName(db, tbl, fromVals)
          val toName = partName(to.getDbName, to.getTableName, to.getValues)
          val oldP = cat.getPartition(db, tbl, fromName)
            .map(ThriftHmsCatalogClient.toThriftPartition)
            .getOrElse(throw new NoSuchObjectException(s"$db.$tbl/$fromName"))
          cat.renamePartition(db, tbl, fromName,
            ThriftHmsCatalogClient.fromThriftPartition(to, toName))
          // the real metastore fires a rename as alter-partition old -> new
          fire(new AlterPartitionEvent(oldP, to, thriftTable(db, tbl), true, null))
          null
        case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
        case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
        case "toString" => "MockHmsServer.Iface"
        case other =>
          throw new UnsupportedOperationException(
            s"mock HMS does not implement $other")
      }
    }
  }

  val iface: ThriftHiveMetastore.Iface = Proxy.newProxyInstance(
    classOf[ThriftHiveMetastore.Iface].getClassLoader,
    Array(classOf[ThriftHiveMetastore.Iface]),
    handler).asInstanceOf[ThriftHiveMetastore.Iface]

  private val serverSocket = new TServerSocket(0)
  val port: Int = serverSocket.getServerSocket.getLocalPort

  private val server = new TThreadPoolServer(
    new TThreadPoolServer.Args(serverSocket)
      .processor(new ThriftHiveMetastore.Processor(iface))
      .protocolFactory(new TBinaryProtocol.Factory()))

  private val thread = new Thread(() => server.serve(), s"mock-hms-$port")
  thread.setDaemon(true)
  thread.start()

  def stop(): Unit = server.stop()
}
