"""Double-invocation idempotency sweep: every queries() entry runs twice
in one session and must return identical rows -- catches cache-dependent
second-invocation bugs (session stores, persisted fixtures) that the
single-shot oracle sweep cannot see. Usage: python3 tools/idempotency_check.py"""
import os, sys
os.chdir('/root/repo'); sys.path.insert(0,'/root/repo')
from pyspark.sql import SparkSession
import __spark_entry__ as e
spark = (SparkSession.builder.master('local[8]')
         .config('spark.sql.shuffle.partitions','8')
         .config('spark.ui.enabled','false').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
qs = e.queries()
out = open('/tmp/idem.txt','w')
bad = []
for name in list(qs):
    try:
        a = sorted(map(str, qs[name](spark, '/root/testdata/sf0.01').collect()))
        b = sorted(map(str, qs[name](spark, '/root/testdata/sf0.01').collect()))
        ok = a == b
        print(name, 'idempotent:', ok, len(a), file=out, flush=True)
        if not ok: bad.append(name)
    except Exception as ex:
        print(name, 'ERROR:', repr(ex)[:200], file=out, flush=True)
        bad.append(name)
print('BAD:', bad, file=out, flush=True)
out.close()
sys.exit(1 if bad else 0)
