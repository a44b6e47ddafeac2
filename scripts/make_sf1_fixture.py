#!/usr/bin/env python3
"""Build the /tmp/sf1 weak-scaling fixture: 10 structure-preserving
replicas of the sf0.1 documents/embeddings/customer tables (ids shifted,
blocking keys salted per replica so lang-/label-/name-blocked candidate
generators stay intra-replica), other tables symlinked. Dev-side tooling
only — the engine itself never depends on pyarrow.

Replica salting per table:
  documents   doc_id += i*1e7, lang = lang||'_r'||i
  embeddings  vec_id += i*1e7, label += i*1000
  customer    c_custkey += i*1e7, c_name = 'R<i>#'||c_name (14-char block)

NOTE text content is NOT perturbed, so content-keyed candidate
generators (simhash bands, exact-hash dedup) DO match across replicas —
for those ops the fixture is a harder-than-weak-scaling instance whose
duplication factor also grows 10x. PERF_NOTES' round-10 audit reports
text_dedup_clusters under that caveat.
"""
import os
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = '/root/testdata/sf0.1'
DST = '/tmp/sf1'
R, OFF = 10, 10_000_000


def rep(table, fn):
    return pa.concat_tables([fn(table, i) for i in range(R)])


def setcol(t, name, arr):
    return t.set_column(t.schema.get_field_index(name), name, arr)


def main():
    os.makedirs(DST, exist_ok=True)
    d = pq.read_table(f'{SRC}/documents.parquet')
    pq.write_table(rep(d, lambda t, i: setcol(
        setcol(t, 'doc_id', pc.add(t['doc_id'], i * OFF)),
        'lang', pc.binary_join_element_wise(
            t['lang'], pa.array([f'r{i}'] * len(t)), '_'))),
        f'{DST}/documents.parquet')
    e = pq.read_table(f'{SRC}/embeddings.parquet')
    pq.write_table(rep(e, lambda t, i: setcol(
        setcol(t, 'vec_id', pc.add(t['vec_id'], i * OFF)),
        'label', pc.add(t['label'], pa.scalar(i * 1000, pa.int32()))
            .cast(pa.int32()))),
        f'{DST}/embeddings.parquet')
    c = pq.read_table(f'{SRC}/customer.parquet')
    pq.write_table(rep(c, lambda t, i: setcol(
        setcol(t, 'c_custkey', pc.add(t['c_custkey'], i * OFF)),
        'c_name', pc.binary_join_element_wise(
            pa.array([f'R{i}'] * len(t)), t['c_name'], '#'))),
        f'{DST}/customer.parquet')
    for t in ['region', 'nation', 'supplier', 'part', 'orders',
              'lineitem', 'events']:
        p = f'{DST}/{t}.parquet'
        if not os.path.exists(p):
            os.symlink(f'{SRC}/{t}.parquet', p)
    for t in ['documents', 'embeddings', 'customer']:
        print(t, pq.ParquetFile(f'{DST}/{t}.parquet').metadata.num_rows)


if __name__ == '__main__':
    main()
