"""Session-level execution defaults for scripts that OWN a Ray session
(bench.py, jobs/*, tools/*) — the library itself never calls ray.init.
"""
from __future__ import annotations


def configure_data_context(num_cpus: int) -> None:
    """Tune Ray Data for this cluster size:

    - shuffle partition count ~ CPU count (the 200-partition default
      costs ~200 near-empty reduce tasks per groupby at small scale;
      raise proportionally per node on a real cluster);
    - no progress bars (clean JSON stdout for the bench driver).
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.min_parallelism = max(4, num_cpus)
    try:
        ctx.read_op_min_num_blocks = max(4, num_cpus)
    except AttributeError:
        pass


_HASH_SHUFFLE_PATCHED = False


def patch_hash_shuffle_schema_broadcast() -> None:
    """Fix an upstream Ray 2.49 hash-shuffle race that crashes every
    ``Dataset.join`` whose input stream starts with a 0-row block.

    The hash-shuffle operator broadcasts the input schema to its
    aggregator actors only with the FIRST block it shuffles per side
    (``_has_schemas_broadcasted``), but the remote ``_shuffle_block``
    task returns early on ``num_rows == 0`` without shipping anything
    — an empty first block therefore consumes the one broadcast while
    delivering no schema, and every aggregator partition that later
    receives no rows finalizes a schema-less empty table, which
    pyarrow's join rejects (``No match ... for key field reference``).
    Empty blocks are routine here: any filter stage can empty a whole
    batch, and every empty partition of an upstream join emits one.

    The patch wraps the driver-side ``_do_add_input_inner`` to feed
    blocks through one at a time and restore the broadcast flag
    whenever the block that consumed it had no rows, so the first
    NON-empty block performs the broadcast.  Driver-side only, 
    idempotent, and a no-op if Ray's internals change shape."""
    global _HASH_SHUFFLE_PATCHED
    if _HASH_SHUFFLE_PATCHED:
        return
    try:
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle)
        from ray.data._internal.execution.operators import (
            hash_shuffle as _hs)

        base = _hs.HashShufflingOperatorBase
        orig = base._do_add_input_inner

        def _schema_safe(self, input_bundle, input_index):
            for ref, md in input_bundle.blocks:
                prev = self._has_schemas_broadcasted[input_index]
                sub = RefBundle(((ref, md),),
                                owns_blocks=input_bundle.owns_blocks,
                                schema=input_bundle.schema)
                orig(self, sub, input_index)
                if not prev and (md.num_rows or 0) == 0:
                    # the broadcast went out with an empty block that
                    # ships nothing remotely — let the next non-empty
                    # block carry it instead
                    self._has_schemas_broadcasted[input_index] = False

        base._do_add_input_inner = _schema_safe
        _HASH_SHUFFLE_PATCHED = True
    except (ImportError, AttributeError):
        # future Ray without this private layout: assume fixed upstream
        _HASH_SHUFFLE_PATCHED = True
