"""Streaming near-dedup curation sink: each micro-batch is MinHash/LSH
near-dedup-filtered against the accumulated corpus BEFORE it lands,
exactly-once, with the corpus side probed through a banded signature
SIDECAR table so per-batch cost never re-reads the corpus text.

The batch twin is ``operators.dedup.filter_near_duplicates_of``; its
cost shape does not survive streaming (it re-shingles and re-bands the
whole corpus every call). This sink keeps the corpus's LSH band rows
``(id, band, bkt)`` in a second lakehouse table maintained in the SAME
exactly-once protocol as the data:

1. batch -> MinHash signatures -> band rows (O(batch));
2. candidate corpus ids = band rows equi-joined to the SIDECAR scan on
   ``(band, bkt)`` - with the sidecar bucket-partitioned on ``bkt``,
   ``scan_where_in`` prunes the probe to the files holding the batch's
   bucket values, so the join touches O(matching files), not the
   corpus;
3. candidates verify with EXACT jaccard against the matched corpus
   docs' text, fetched by id through ``scan_where_in`` on the MAIN
   table (key-range/bloom-pruned point lookups);
4. batch rows near-duplicating the corpus drop; intra-batch near-dups
   drop keep-smallest-id (greedy pairwise, deterministic);
5. ONE append of the survivors to the main table and ONE append of
   their band rows to the sidecar, each stamped ``(query-id, epoch)``.

Exactly-once across TWO tables: each append is individually
epoch-idempotent, and the dedup decision is REPLAY-DETERMINISTIC
because the corpus side always excludes the current batch's ids - a
crash between the two appends replays into "skip the committed one,
redo the other" with byte-identical survivors. (Without the exclusion,
a replay would see the batch's own rows in the corpus and drop
everything - the classic self-match trap.)

Contract: ``id_col`` uniquely identifies a document across the stream's
lifetime. A re-delivered id is excluded from the corpus probe (it IS
the same document), so it re-enters only through the epoch skip, never
as a self-duplicate.

Sidecar lifecycle (r12, VERDICT r11 #3): every epoch appends one SMALL
band-rows file per touched bucket partition, so at stream scale the
sidecar's file count - not its byte size - comes to dominate probe cost
(``scan_where_in`` prunes to matching partitions, but each pruned
partition then opens every small file in it). ``maintain_every=N``
runs ``maintenance.auto_maintain`` on the sidecar after every N epoch
commits: compaction is partition-boundary-aware, so rewritten files
stay one-partition-pure and the ``bkt`` probe prunes exactly as before
(content-preserving - band rows are immutable facts about committed
docs, so a rewrite can never change a dedup decision). Retention: band
rows live as long as their documents (they ARE the corpus index);
snapshot EXPIRY on the sidecar is safe for exactly-once (Spark replays
only the last epoch, which expiry's retention floor keeps) but must
never delete live data files - expire_snapshots only GCs unreferenced
ones, so the invariant holds by construction.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    _token_array,
    minhash_band_rows,
    minhash_near_duplicates,
    minhash_signatures,
)
from ..table import LakehouseTable
from .sink import _EPOCH_KEY, _QUERY_KEY, EpochCommitSink

# above this many distinct bucket probes the per-file pruning loop on
# the driver costs more than one sidecar scan: fall back to the plain
# band join (still one equality shuffle, no pruning)
_MAX_BUCKET_PROBES = 4096


def signature_sidecar_spec(n_buckets: int = 64) -> list:
    """Partition spec for the sidecar table: bucket-partitioned on the
    band-bucket value so a batch's probe prunes to matching files."""
    from ..table import PartitionField

    return [
        PartitionField("bkt", "bucket", "bkt_bucket", n_buckets=n_buckets)
    ]


class NearDedupSink(EpochCommitSink):
    """``foreachBatch`` callable appending only near-dup-free rows.

    ``sig_table`` is the banded-signature sidecar: schema
    ``(<id_col> <id type>, band int, bkt int)``, ideally created with
    :func:`signature_sidecar_spec` so corpus probes prune. Both tables
    are epoch-stamped; see the module docstring for the two-table
    replay argument."""

    def __init__(
        self,
        table: LakehouseTable,
        sig_table: LakehouseTable,
        query_id: str,
        text_col: str,
        id_col: str,
        threshold: float = 0.9,
        n_hashes: int = 128,
        n_bands: int = 32,
        shingle_len: int = 1,
        seed: int = 42,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        maintain_every: int | None = None,
    ):
        super().__init__(table, query_id, transform=transform)
        self.sig_table = sig_table
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.rows_per_band = n_hashes // n_bands
        self.shingle_len = shingle_len
        self.seed = seed
        # run auto_maintain on the SIDECAR after every N sidecar epoch
        # commits (None = caller owns maintenance). Thresholds come
        # from the sidecar's own `maintenance.*` table properties.
        if maintain_every is not None and maintain_every < 1:
            # same gate as EpochCommitSink: 0 would fire maintenance
            # on every epoch instead of meaning "off" (review r13)
            raise ValueError(
                f"maintain_every must be >= 1 or None, got {maintain_every}"
            )
        self.maintain_every = maintain_every
        self._sig_commits_since_maintain = 0
        self._sig_committed: set[int] | None = None

    def _sig_committed_epochs(self) -> set[int]:
        if self._sig_committed is None:
            self._sig_committed = {
                int(s.summary[_EPOCH_KEY])
                for s in self.sig_table.snapshots()
                if s.summary.get(_QUERY_KEY) == self.query_id
                and _EPOCH_KEY in s.summary
            }
        return self._sig_committed

    def _survivors(
        self, batch_df: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """``(survivors, band_rows)``: the near-dup-free subset of the
        batch, replay-deterministic (corpus side excludes the batch's
        own ids), plus the batch's LSH band rows - returned so the
        sidecar append reuses them instead of re-signing the
        survivors (review r11: the signature pass is the dominant
        per-batch cost)."""
        batch_df = batch_df.localCheckpoint(eager=True)
        sigs = minhash_signatures(
            batch_df,
            self.text_col,
            self.id_col,
            self.n_hashes,
            self.shingle_len,
            self.seed,
        ).localCheckpoint(eager=True)
        bands = minhash_band_rows(
            sigs, self.id_col, self.n_bands, self.rows_per_band
        )
        # --- corpus candidates via the sidecar
        probes = [
            r["bkt"] for r in bands.select("bkt").distinct().collect()
        ]
        if not probes:
            return batch_df, bands
        if len(probes) <= _MAX_BUCKET_PROBES:
            corpus_bands = self.sig_table.scan_where_in("bkt", probes)
        else:
            corpus_bands = self.sig_table.scan()
        batch_ids = batch_df.select(self.id_col)
        corpus_bands = corpus_bands.join(
            batch_ids, on=self.id_col, how="left_anti"
        )
        cands = (
            bands.withColumnRenamed(self.id_col, "__new_id")
            .join(
                corpus_bands.withColumnRenamed(self.id_col, "__corp_id"),
                on=["band", "bkt"],
            )
            .select("__new_id", "__corp_id")
            .distinct()
        )
        corp_ids = [
            r["__corp_id"]
            for r in cands.select("__corp_id").distinct().collect()
        ]
        dropped = None
        if corp_ids:
            # exact-jaccard verification against the matched corpus
            # docs' text - point lookups, never a corpus scan
            corp_toks = self.table.scan_where_in(
                self.id_col, corp_ids
            ).select(
                F.col(self.id_col).alias("__corp_id"),
                F.array_distinct(
                    _token_array(
                        F.col(self.text_col), self.shingle_len
                    )
                ).alias("__tc"),
            )
            new_toks = batch_df.select(
                F.col(self.id_col).alias("__new_id"),
                F.array_distinct(
                    _token_array(
                        F.col(self.text_col), self.shingle_len
                    )
                ).alias("__tn"),
            )
            inter = F.size(F.array_intersect("__tn", "__tc"))
            union = F.size("__tn") + F.size("__tc") - inter
            dropped = (
                cands.join(new_toks, "__new_id")
                .join(corp_toks, "__corp_id")
                .filter(
                    (inter / union) >= F.lit(self.threshold)
                )
                .select(F.col("__new_id").alias(self.id_col))
                .distinct()
            )
        out = batch_df
        if dropped is not None:
            out = out.join(dropped, on=self.id_col, how="left_anti")
        # --- intra-batch: greedy pairwise, keep the smallest id
        pairs = minhash_near_duplicates(
            out,
            self.text_col,
            self.id_col,
            self.threshold,
            self.n_hashes,
            self.n_bands,
            self.shingle_len,
            self.seed,
        ).select(F.col("id_b").alias(self.id_col)).distinct()
        return out.join(pairs, on=self.id_col, how="left_anti"), bands

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        """Two individually epoch-idempotent appends; a crash between
        them replays into completing only the missing one, with the
        SAME survivors (see module docstring)."""
        from .sink import _advance_watermark, _read_watermark

        epoch_id = int(epoch_id)
        main = self.committed_epochs()
        sigs = self._sig_committed_epochs()
        # the base sink's epoch high-watermark guard, mirrored per its
        # __call__ contract (review r13): expiry - which this sink's
        # own maintain_every can trigger on the sidecar - may prune an
        # old epoch's stamp, and "stamp absent" alone must not let an
        # at-or-below-watermark replay re-append. Membership in the
        # stamp set is implied by <= max, so the watermark (which also
        # folds in the persisted sidecar file, surviving even an
        # all-stamps-pruned expiry) is the one test per table.
        main_done = epoch_id <= max(
            _read_watermark(self.table, self.query_id),
            max(main) if main else -1,
        )
        sig_done = epoch_id <= max(
            _read_watermark(self.sig_table, self.query_id),
            max(sigs) if sigs else -1,
        )
        if main_done and sig_done:
            return
        if self.transform is not None:
            batch_df = self.transform(batch_df)
        survivors, band_rows = self._survivors(batch_df)
        survivors = survivors.localCheckpoint(eager=True)
        if survivors.isEmpty():
            return  # nothing to commit; replay recomputes identically
        stamp = {_QUERY_KEY: self.query_id, _EPOCH_KEY: epoch_id}
        if not main_done:
            self.table.append(
                survivors,
                extra_summary=stamp,
                identity_epoch=f"{self.query_id}:{epoch_id}",
            )
            self.committed_epochs().add(epoch_id)
            _advance_watermark(self.table, self.query_id, epoch_id)
        if not sig_done:
            # the batch's band rows were computed (and checkpointed
            # upstream) once in _survivors: the survivors' sidecar
            # rows are a semi-join away, no re-signing
            sig_rows = band_rows.join(
                survivors.select(self.id_col),
                on=self.id_col,
                how="left_semi",
            )
            self.sig_table.append(sig_rows, extra_summary=stamp)
            self._sig_committed_epochs().add(epoch_id)
            _advance_watermark(self.sig_table, self.query_id, epoch_id)
            self._sig_commits_since_maintain += 1
            if (
                self.maintain_every is not None
                and self._sig_commits_since_maintain
                >= self.maintain_every
            ):
                self._sig_commits_since_maintain = 0
                self._maintain_sidecar()

    def _maintain_sidecar(self) -> dict:
        """Compact the many-small-epoch-files sidecar in place (module
        docstring, "Sidecar lifecycle"). Partition-boundary-aware
        compaction keeps rewritten files one-``bkt``-partition-pure, so
        the probe's ``scan_where_in`` pruning survives; content is
        unchanged, so replay determinism is untouched. Failures must
        never fail the stream (the next due epoch retries), but they
        are LOGGED - a persistently failing compaction silently
        regrows exactly the small-file problem this hook exists to
        solve (review r12)."""
        import logging

        from ..maintenance import auto_maintain

        try:
            return auto_maintain(self.sig_table)
        except Exception as exc:  # pragma: no cover - defensive
            logging.getLogger(__name__).warning(
                "sidecar auto_maintain failed for %s: %r "
                "(stream continues; next due epoch retries)",
                self.sig_table.location,
                exc,
            )
            return {"error": repr(exc)}


def write_dedup_stream_to_table(
    stream_df: DataFrame,
    table: LakehouseTable,
    sig_table: LakehouseTable,
    checkpoint_dir: str,
    query_id: str,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    available_now: bool = False,
    trigger_secs: int | None = None,
    **kwargs,
):
    """Start a streaming query near-dedup-curating ``stream_df`` into
    ``table`` (see :class:`NearDedupSink`)."""
    writer = (
        stream_df.writeStream.foreachBatch(
            NearDedupSink(
                table,
                sig_table,
                query_id,
                text_col,
                id_col,
                threshold=threshold,
                **kwargs,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_secs is not None:
        writer = writer.trigger(processingTime=f"{trigger_secs} seconds")
    return writer.start()


def near_dedup_append(
    table: LakehouseTable,
    sig_table: LakehouseTable,
    batch_df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.9,
    **kwargs,
):
    """Batch twin of :class:`NearDedupSink`: near-dedup-filter ONE
    batch against the accumulated corpus through the banded signature
    sidecar and append the survivors (plus their band rows) - the
    COPY INTO-shaped curation path, sharing the sink's probe so batch
    and streaming ingestion keep one dedup semantics and one sidecar.

    Returns ``{"appended": n, "dropped": m}``. NOT exactly-once: a
    re-run of the same batch re-probes the corpus - its ids are now
    PRESENT in the sidecar, and id-matching corpus rows are excluded
    from the probe (the re-delivery contract), so re-appending the
    same ids is the caller's bug to avoid (wrap in the ingest ledger
    or use the streaming sink for replayable sources)."""
    sink = NearDedupSink(
        table,
        sig_table,
        query_id="__batch__",
        text_col=text_col,
        id_col=id_col,
        threshold=threshold,
        **kwargs,
    )
    survivors, band_rows = sink._survivors(batch_df)
    survivors = survivors.localCheckpoint(eager=True)
    n = survivors.count()
    if n:
        table.append(survivors)
        sig_table.append(
            band_rows.join(
                survivors.select(id_col), on=id_col, how="left_semi"
            )
        )
    return {"appended": n, "dropped": batch_df.count() - n}
