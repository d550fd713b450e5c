"""Catalog's Iceberg path, tested at the interface level with fakes (the
sandbox has no Iceberg runtime jar — SURVEY.md header): when a namespace is
configured AND the runtime classes load, write() must route through
DataFrameWriterV2 (writeTo ... using('iceberg')) and read() through
spark.read.table; without a namespace, or when the classes don't load, the
parquet fallback must be taken (exercised for real by every other suite)."""

import rt_etl_yahoo_search_engine_spark.sources.catalog as cat_mod
from rt_etl_yahoo_search_engine_spark.sources.catalog import Catalog


class _FakeWriterV2:
    def __init__(self, log, ident):
        self.log = log
        self.ident = ident

    def using(self, fmt):
        self.log.append(("using", self.ident, fmt))
        return self

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", self.ident, len(cols)))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ident))

    def append(self):
        self.log.append(("append", self.ident))


class _FakeV1Writer:
    def __init__(self, log):
        self.log = log

    def mode(self, m):
        self.log.append(("v1.mode", m))
        return self

    def partitionBy(self, *cols):
        return self

    def parquet(self, path):
        self.log.append(("v1.parquet", path))


class _FakeCatalogAPI:
    def __init__(self, existing):
        self.existing = existing

    def tableExists(self, ident):
        return ident in self.existing


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def table(self, ident):
        self.log.append(("read.table", ident))
        return _FakeDF(self.log, jvm_ok=True)

    def parquet(self, *paths):
        self.log.append(("read.parquet", paths))
        return "parquet-df"


class _FakeSpark:
    def __init__(self, log, jvm_ok=True, existing=()):
        self.log = log
        self._jvm = _FakeJVM(jvm_ok)
        self.read = _FakeReader(log)
        self.catalog = _FakeCatalogAPI(set(existing))


class _FakeJVM:
    def __init__(self, ok):
        self._ok = ok

    @property
    def org(self):
        if not self._ok:
            raise RuntimeError("no iceberg classes on the classpath")
        return self  # attribute chain org.apache.iceberg.Table resolves to self

    apache = property(lambda self: self)
    iceberg = property(lambda self: self)
    Table = property(lambda self: self)


class _FakeDF:
    def __init__(self, log, jvm_ok=True, existing=()):
        self.log = log
        self.sparkSession = _FakeSpark(log, jvm_ok, existing)
        self.write = _FakeV1Writer(log)

    def writeTo(self, ident):
        return _FakeWriterV2(self.log, ident)

    def unionByName(self, other):
        self.log.append(("unionByName",))
        return self


def test_write_routes_to_writer_v2(tmp_path):
    log = []
    cat = Catalog(str(tmp_path), iceberg_namespace="lake.db")
    cat.write(_FakeDF(log), "docmap")
    assert ("using", "lake.db.docmap", "iceberg") in log
    assert ("createOrReplace", "lake.db.docmap") in log
    assert not any(op[0].startswith("v1.") for op in log)


def test_write_append_creates_then_appends(tmp_path):
    log = []
    cat = Catalog(str(tmp_path), iceberg_namespace="lake.db")
    cat.write(_FakeDF(log), "tokens", mode="append")  # table absent -> create
    assert ("createOrReplace", "lake.db.tokens") in log
    log2 = []
    cat.write(
        _FakeDF(log2, existing={"lake.db.tokens"}), "tokens", mode="append"
    )
    assert ("append", "lake.db.tokens") in log2


def test_write_partitioned(tmp_path, spark):
    # needs a live SparkContext only because F.col() builds a JVM Column
    log = []
    cat = Catalog(str(tmp_path), iceberg_namespace="lake.db")
    cat.write(_FakeDF(log), "postings", partition_by=["shard"])
    assert ("partitionedBy", "lake.db.postings", 1) in log


def test_read_routes_to_table(tmp_path):
    log = []
    cat = Catalog(str(tmp_path), iceberg_namespace="lake.db")
    cat.read(_FakeSpark(log), "docmap", "docmap_1")
    assert ("read.table", "lake.db.docmap") in log
    assert ("read.table", "lake.db.docmap_1") in log
    assert ("unionByName",) in log


def test_fallback_without_namespace(tmp_path):
    log = []
    cat = Catalog(str(tmp_path))  # no namespace configured
    assert cat.iceberg_ns is None or cat.iceberg_ns  # env may set it
    cat_no = Catalog(str(tmp_path), iceberg_namespace=None)
    cat_no.iceberg_ns = None
    cat_no.write(_FakeDF(log), "docmap")
    assert ("v1.parquet", cat_no.path("docmap")) in log


def test_fallback_when_runtime_classes_missing(tmp_path):
    log = []
    cat = Catalog(str(tmp_path), iceberg_namespace="lake.db")
    cat.write(_FakeDF(log, jvm_ok=False), "docmap")
    assert ("v1.parquet", cat.path("docmap")) in log
    log2 = []
    assert cat.read(_FakeSpark(log2, jvm_ok=False), "docmap") == "parquet-df"


def test_iceberg_available_probe_is_used(tmp_path):
    # the probe itself: True iff the jvm attribute chain resolves
    assert cat_mod._iceberg_available(_FakeSpark([], jvm_ok=True))
    assert not cat_mod._iceberg_available(_FakeSpark([], jvm_ok=False))
