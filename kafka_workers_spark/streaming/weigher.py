"""A8 parity depth: the reference's record-weight model and queue-sizing
arithmetic, ported to the Spark admission-control vocabulary.

The reference bounds memory by weighing every in-flight record
(impl/record/weigher/RecordWeigher.java:18-66 over the per-type weighers
in api/record/weigher/) and pausing partitions when byte-weighed queues
fill (impl/queues/QueuesManager.java:59-88). Spark has no unbounded
in-heap queue — admission happens at the source via
``maxBytesPerTrigger``/``maxOffsetsPerTrigger`` — but the SIZING question
is identical: how many bytes may be in flight for a given heap. This
module ports both halves:

- :func:`record_weight_bytes` / :func:`record_weight_latin1` — the
  reference's heap-weight formula as codegen column expressions,
  bit-exact against BaseRecordWeigherTest's known-answer tables
  (src/test/java/.../api/record/weigher/BaseRecordWeigherTest.java:31-41:
  empty byte[] record = 280 bytes, 111/222-byte payloads = 616, ...).
  :func:`record_weight_utf8` (on-wire octet sizing) and
  :func:`record_weight_utf16_bound` (hard heap upper bound) extend the
  string family beyond the reference's LATIN1 assumption — see each
  docstring for which coder regime it covers.
- :func:`admission_plan` — QueuesManager's budget arithmetic
  (total = ``queue.total.size.heap.ratio`` × heap, split evenly across
  sub-partition queues, resume at ``queue.resume.ratio`` × limit;
  QueuesManager.java:59,76-88) translated into recommended source
  options, with the measured mean record weight closing the loop from
  bytes to offsets.

Constants are the reference's small-heap (<32 GiB, compressed oops)
values: 16-byte object/array headers, 4-byte references, 8-byte
alignment (api/record/weigher/WeigherHelpers.java:36-75).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: object/array header under compressed oops (WeigherHelpers.headerSize)
_HEADER = 16
#: WorkerRecord + RecordHeaders instance overhead net of the key/value/
#: topic/headers fields that are weighed separately — the constant that
#: makes the empty record come out at exactly 280 bytes like the
#: reference's known-answer test
_RECORD_NET = 200
#: String object overhead beyond its backing byte[] (String header +
#: value ref + coder + hash + hashIsZero, padded) — LATIN1 coder assumed,
#: exactly like StringWeigher.java:18-21
_STRING_NET = 32


def _pad8(size: Column) -> Column:
    """8-byte alignment padding (WeigherHelpers.padding)."""
    return (F.floor((size + F.lit(7)) / F.lit(8)) * F.lit(8)).cast("bigint")


def _array_weight(length: Column) -> Column:
    """paddedSize(header + length) — ByteArrayWeigher.weight; NULL arrays
    weigh 0 (ByteArrayWeigher.java:14-16)."""
    return F.coalesce(_pad8(F.lit(_HEADER) + length), F.lit(0).cast("bigint"))


def record_weight_bytes(
    key: Column | str,
    value: Column | str,
    topic: Column | str,
) -> Column:
    """Heap weight of a byte[]-keyed/valued record (headers not counted —
    the Kafka source exposes them separately; add
    ``_array_weight(length(h))`` terms per header if needed). Bit-exact
    against BaseRecordWeigherTest.shouldWeighByteArrays: (0,0)→280,
    (3,4)→296, (111,222)→616."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    t = F.col(topic) if isinstance(topic, str) else topic
    return (
        F.lit(_RECORD_NET).cast("bigint")
        + _array_weight(F.length(k))
        + _array_weight(F.length(v))
        + F.lit(_STRING_NET)
        + _array_weight(F.length(t))
    )


def record_weight_latin1(
    key: Column | str,
    value: Column | str,
    topic: Column | str,
) -> Column:
    """Heap weight when key/value are Strings (LATIN1 coder, so string
    length == backing-array length — StringWeigher.java:18-21). Bit-exact
    against BaseRecordWeigherTest's string table: (0,0)→344.

    CAVEAT — the LATIN1 assumption is the reference's, and it breaks
    silently: a JVM string containing ANY non-Latin-1 character stores
    under the UTF16 coder (2 bytes/char), so this expression
    underestimates such payloads by up to 2×. Safe for ASCII-ish keys
    and topics; for arbitrary text, size by encoded bytes instead —
    :func:`record_weight_utf8` weighs the UTF-8 octet length (the
    on-wire size, and a tight bound for a byte[]-deserialized record)."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    t = F.col(topic) if isinstance(topic, str) else topic

    def s(c: Column) -> Column:
        return F.coalesce(
            F.lit(_STRING_NET).cast("bigint") + _pad8(F.lit(_HEADER) + F.length(c)),
            F.lit(0).cast("bigint"),
        )

    return (
        F.lit(_RECORD_NET).cast("bigint")
        + s(k)
        + s(v)
        + F.lit(_STRING_NET)
        + _array_weight(F.length(t))
    )


def record_weight_utf8(
    key: Column | str,
    value: Column | str,
    topic: Column | str,
) -> Column:
    """Heap weight for string records sized by UTF-8 OCTET length —
    the variant to use when payloads are not Latin-1-only (see
    :func:`record_weight_latin1`'s caveat). ``octet_length`` is the
    encoded byte count, i.e. the record's on-wire size and exactly the
    backing-array size a byte[]-deserialized consumer would weigh. For
    JVM UTF16-coded strings it is a strict improvement over the LATIN1
    estimate but still a LOWER bound, and not by a constant factor: one
    non-Latin-1 char in a long ASCII payload flips the backing array to
    UTF16 (2 bytes/char ≈ 2n) while octet_length ≈ n+1, so the weigher
    can under-estimate heap by up to ~2× and admit MORE than the heap
    budget allows (ADVICE r05). For a hard heap bound on String-coded
    records, weigh the UTF16 array upper bound with
    :func:`record_weight_utf16_bound`, or deserialize to byte[] and
    weigh with the exact :func:`record_weight_bytes`."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    t = F.col(topic) if isinstance(topic, str) else topic

    def s(c: Column) -> Column:
        return F.coalesce(
            F.lit(_STRING_NET).cast("bigint") + _pad8(F.lit(_HEADER) + F.octet_length(c)),
            F.lit(0).cast("bigint"),
        )

    return (
        F.lit(_RECORD_NET).cast("bigint")
        + s(k)
        + s(v)
        + F.lit(_STRING_NET)
        + _array_weight(F.octet_length(t))
    )


def record_weight_utf16_bound(
    key: Column | str,
    value: Column | str,
    topic: Column | str,
) -> Column:
    """UPPER-bound heap weight for String-coded records: backing arrays
    sized at 2 bytes per UTF-16 CODE UNIT (``octet_length(encode(c,
    'UTF-16BE'))`` — exactly the UTF16 coder's array size, surrogate
    pairs included) — the hard arm of the string-weigher family. The
    JVM stores a string as LATIN1 (1 byte/char) when it can and UTF16
    (2 bytes/code unit) when any char needs it, so for every payload
    the true backing array is ≤ this expression's; an admission budget
    weighed with it can never admit more than the heap holds (the
    guarantee neither :func:`record_weight_latin1` — up to 2× under on
    UTF16 — nor :func:`record_weight_utf8` — under on UTF16-coded
    mostly-ASCII mixes — provides). NOTE ``2 × length()`` would NOT be
    a bound: Spark's ``length`` counts code points, so supplementary
    chars (emoji — two code units each) would be under-weighed 2×.
    Price: ASCII-only traffic is over-weighed ~2×, halving effective
    queue depth; pick per topic — latin1 for known-ASCII, utf8 for
    on-wire accounting, this for a hard heap bound."""
    k = F.col(key) if isinstance(key, str) else key
    v = F.col(value) if isinstance(value, str) else value
    t = F.col(topic) if isinstance(topic, str) else topic

    def units2(c: Column) -> Column:
        # bytes of the UTF16 backing array: 2 per code unit, no BOM
        return F.octet_length(F.encode(c, "UTF-16BE"))

    def s(c: Column) -> Column:
        return F.coalesce(
            F.lit(_STRING_NET).cast("bigint") + _pad8(F.lit(_HEADER) + units2(c)),
            F.lit(0).cast("bigint"),
        )

    return (
        F.lit(_RECORD_NET).cast("bigint")
        + s(k)
        + s(v)
        + F.lit(_STRING_NET)
        + _array_weight(units2(t))
    )


def mean_record_weight(
    df: DataFrame,
    key: str = "key",
    value: str = "value",
    topic: str = "topic",
    latin1: bool = False,
) -> float:
    """Measured mean heap weight over a sample DataFrame — the input
    :func:`admission_plan` needs. One codegen aggregate; run it on a
    bounded sample of the topic, not the full stream."""
    w = (record_weight_latin1 if latin1 else record_weight_bytes)(key, value, topic)
    row = df.agg(F.avg(w).alias("w")).first()
    return float(row.w) if row.w is not None else 0.0


def admission_plan(
    heap_bytes: int,
    n_subpartitions: int,
    mean_record_bytes: float,
    heap_ratio: float = 0.5,
    resume_ratio: float = 0.9,
) -> dict:
    """QueuesManager's sizing arithmetic → Spark source options.

    Reference semantics (QueuesManager.java:59,76-88, defaults
    README.md:231-283): total in-flight budget = ``heap_ratio`` × heap
    (``queue.total.size.heap.ratio``, default 0.5); each sub-partition
    queue pauses its partition at total/num_queues bytes and resumes at
    ``resume_ratio`` × that (``queue.resume.ratio``, default 0.9).

    Spark mapping: the in-flight set is one micro-batch, so the batch is
    the queue — ``source_options`` carries ``maxBytesPerTrigger`` with
    the TOTAL budget, ready to apply verbatim. The equivalent record
    count under the measured mean weight is reported separately as
    ``max_offsets_equivalent`` (NOT under ``source_options``: the Kafka
    source REJECTS setting both bounds at once — "Max offset and max
    bytes per trigger can't be set at the same time" — so the offsets
    form is for sources that lack a byte bound; swap it in as
    ``maxOffsetsPerTrigger`` INSTEAD of the byte option). Per-queue
    pause/resume levels are returned for parity visibility (Spark needs
    no per-partition pause — nothing unbounded buffers on-heap).
    """
    if heap_bytes <= 0 or n_subpartitions < 1:
        raise ValueError("admission_plan: heap_bytes > 0 and n_subpartitions >= 1 required")
    total = int(heap_bytes * heap_ratio)
    per_queue_pause = total // max(1, n_subpartitions)
    per_queue_resume = int(resume_ratio * per_queue_pause)
    plan = {
        "queues_total_size_bytes": total,
        "queue_size_bytes_to_pause": per_queue_pause,
        "queue_size_bytes_to_resume": per_queue_resume,
        "source_options": {"maxBytesPerTrigger": str(total)},
    }
    if mean_record_bytes > 0:
        plan["max_offsets_equivalent"] = max(1, int(total / mean_record_bytes))
    return plan
