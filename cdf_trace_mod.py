
import os
from real_time_event_streaming_pipeline_spark.streaming.tx_cdf_source import (
    TxChangeFeedDataSource, _TxChangeFeedStreamReader)

LOG = "/tmp/cdf_trace.log"

class TracingReader(_TxChangeFeedStreamReader):
    def _log(self, *a):
        with open(LOG, "a") as fh:
            print(*a, file=fh, flush=True)
    def initialOffset(self):
        r = super().initialOffset(); self._log("initialOffset ->", r); return r
    def latestOffset(self):
        r = super().latestOffset(); self._log("latestOffset cursor=", self._cursor, "->", r); return r
    def partitions(self, start, end):
        self._log("partitions", start, end)
        return super().partitions(start, end)
    def commit(self, end):
        self._log("commit", end); return super().commit(end)

class TracingCdf(TxChangeFeedDataSource):
    @classmethod
    def name(cls): return "txcdftrace"
    def streamReader(self, schema):
        import json
        fields = [(f.name, f.dataType.typeName()) for f in self._table_struct().fields]
        return TracingReader(self.options, fields)
