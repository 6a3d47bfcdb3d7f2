"""EPIK-TPU command-line interface.

One CLI replaces both reference layers: the Python click wrapper
(reference: epik.py:29-70, flag surface -i/-s/--omega/--mu/-o/--threads/
--max-ram) and the C++ driver binary (reference: epik/src/epik/main.cpp:
205-391, flags -d/-q/-j/--batch-size/--keep-at-most/--keep-factor and the
full load -> place -> jplace orchestration).  There is no compile-time
DNA/amino fork -- the database self-describes its alphabet, and ``-s`` is
validated against it (the reference instead picks epik-dna vs epik-aa,
epik.py:78-83).
"""

from __future__ import annotations

import os
import sys
import time

import click

from .. import __version__
from ..core.tree import parse_newick, to_newick
from ..io.db import PKDB_VALUE_SIZE, load
from ..io.fasta import batch_fasta
from ..io.jplace import jplace_writer
from ..utils.progress import (
    ProgressBar,
    humanize_time,
    parse_human_readable,
    to_human_readable,
)

__all__ = ["epik", "place_queries"]


@click.group()
@click.version_option(__version__)
def epik():
    """EPIK-TPU: Evolutionary Placement with Informative K-mers, TPU-native."""


@epik.command()
@click.option("-i", "-d", "--database", required=True,
              type=click.Path(dir_okay=False, file_okay=True, exists=True),
              help="Input database.")
@click.option("-s", "--states", type=click.Choice(["nucl", "amino"]), default="nucl",
              show_default=True, help="States used in analysis.")
@click.option("--omega", type=float, default=1.5,
              help="User omega value, determines the score threshold.")
@click.option("--mu", type=float, default=1.0,
              help="The proportion of the database to keep.")
@click.option("-o", "--outputdir", required=True,
              type=click.Path(dir_okay=True, file_okay=False, exists=True),
              help="Output directory.")
@click.option("-j", "--threads", type=int, default=1, show_default=True,
              help="Host worker threads for tokenization (device count is "
                   "controlled by jax).")
@click.option("--max-ram", type=str, default="", show_default=True,
              help="Approximate RAM limit to use. Database may not be fully loaded")
@click.option("--batch-size", type=int, default=2000, show_default=True,
              help="Batch size (reads per device step).")
@click.option("--keep-at-most", type=int, default=7, show_default=True,
              help="Number of branches to report.")
@click.option("--keep-factor", type=float, default=0.01, show_default=True,
              help="Minimum LWR to report.")
@click.option("--engine",
              type=click.Choice(["jax", "sharded", "native", "reference"]),
              default="jax", show_default=True,
              help="Placement engine: single-device TPU/XLA pipeline, the "
                   "multi-device sharded engine, the native C++ CPU placer "
                   "(-j threads, no JAX device needed), or the scalar "
                   "oracle.")
@click.option("--n-model", type=int, default=1, show_default=True,
              help="Model-axis shards for --engine sharded (database "
                   "hash-sharded when > 1); remaining devices go data-parallel.")
@click.option("--platform", type=str, default=None,
              help="Force a jax platform (e.g. cpu, tpu). Default: jax's choice.")
@click.option("--inflight", type=int, default=3, show_default=True,
              help="Batches placed concurrently (hides per-dispatch device/"
                   "tunnel latency; 1 = the reference's synchronous loop).")
@click.option("--resume", is_flag=True, default=False,
              help="Resume an interrupted run: keep complete placements in the "
                   "existing output file and continue from the next read.")
@click.option("--verbose", is_flag=True, default=False,
              help="Print the pipeline stage-time breakdown.")
@click.option("--profile-dir", type=click.Path(), default=None,
              help="Capture a jax profiler trace of the run into this directory.")
@click.option("--precision", type=click.Choice(["exact", "int16", "bf16"]),
              default="exact", show_default=True,
              help="Dense-plane storage: exact f32, int16 quantized shifted "
                   "grid (half the plane bytes, parity-clean), or bf16 "
                   "(fast but outside the 1e-4 parity gate).")
@click.option("--plane-mode", type=click.Choice(["shifted", "classic"]),
              default="shifted", show_default=True,
              help="Dense scoring formulation (classic materializes exact "
                   "per-branch counts; shifted is the single-reduce fast path).")
@click.option("--pair-plane", type=click.Choice(["auto", "on", "off"]),
              default="auto", show_default=True,
              help="(k+1)-mer pair plane: one row gather per two windows "
                   "when the combined plane fits HBM.")
@click.option("--tile-payload", type=click.Choice(["auto", "packed", "f32"]),
              default="auto", show_default=True,
              help="Posting-tile cell layout (the big-tree path): packed "
                   "int32 (branch<<16 | quantized score; half the gather "
                   "bytes + exact bf16-digit MXU accumulate) or bit-exact "
                   "f32 pairs.")
@click.option("--coordinator", type=str, default=None,
              help="Multi-host: coordinator address host:port (rank 0 "
                   "serves it); requires --num-processes and --process-id.")
@click.option("--num-processes", type=int, default=None,
              help="Multi-host: total process count.")
@click.option("--process-id", type=int, default=None,
              help="Multi-host: this process's rank.")
@click.option("--collective-timeout", type=float, default=300.0,
              show_default=True,
              help="Multi-host: seconds a device step may stall before the "
                   "watchdog exits the process for supervised restart "
                   "(resume from the jplace sidecar with --resume).")
@click.argument("input_file", type=click.Path(exists=True))
def place(database, states, omega, mu, outputdir, threads, max_ram, batch_size,
          keep_at_most, keep_factor, engine, n_model, platform, inflight,
          resume, verbose, profile_dir, precision, plane_mode, pair_plane,
          tile_payload, coordinator, num_processes, process_id,
          collective_timeout,
          input_file):
    """Places .fasta files using the input phylo-k-mer database.

    epik place -s [nucl|amino] -i DB.eptk -o output file.fasta
    """
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    rc = place_queries(
        database, states, omega, mu, outputdir, threads, max_ram, input_file,
        batch_size=batch_size, keep_at_most=keep_at_most, keep_factor=keep_factor,
        engine=engine, resume=resume, verbose=verbose, profile_dir=profile_dir,
        n_model=n_model, inflight=inflight, precision=precision,
        plane_mode=plane_mode, pair_plane=pair_plane,
        tile_payload=tile_payload, coordinator=coordinator,
        num_processes=num_processes, process_id=process_id,
        collective_timeout=collective_timeout,
    )
    if rc:
        raise SystemExit(rc)


class _SkippingReader:
    """Reader adapter that skips the first n already-placed records (resume)."""

    def __init__(self, reader, skip: int):
        self._reader = reader
        self._skip = skip
        self._pending: list | None = None

    def next_batch(self):
        if self._pending is not None:
            out, self._pending = self._pending, None
            return out
        while True:
            batch = self._reader.next_batch()
            if not batch or self._skip == 0:
                return batch
            if len(batch) <= self._skip:
                self._skip -= len(batch)
                continue
            out = batch[self._skip :]
            self._skip = 0
            return out

    def bytes_read(self):
        return self._reader.bytes_read()


def make_invocation(argv: list[str]) -> str:
    """argv joined with a trailing space (reference: main.cpp:23-32)."""
    return "".join(a + " " for a in argv)


def make_output_filename(input_file: str, output_dir: str) -> str:
    """placements_<input filename>.jplace (reference: main.cpp:34-37)."""
    return os.path.join(output_dir, "placements_" + os.path.basename(input_file) + ".jplace")


def place_queries(database, states, omega, mu, outputdir, threads, max_ram,
                  input_file, batch_size=2000, keep_at_most=7, keep_factor=0.01,
                  engine="jax", invocation=None, resume=False, verbose=False,
                  profile_dir=None, n_model=1, inflight=3, precision="exact",
                  plane_mode="shifted", pair_plane="auto",
                  tile_payload="auto", coordinator=None, num_processes=None,
                  process_id=None, collective_timeout=300.0) -> int:
    """Full pipeline orchestration (reference: main.cpp:237-383)."""
    if not (0.0 <= mu <= 1.0):
        click.echo("Error: Mu has to a value in [0, 1]", err=True)
        return -1

    max_entries = None
    if max_ram:
        try:
            max_bytes = parse_human_readable(max_ram)
        except ValueError as e:
            click.echo(f"Error: {e}", err=True)
            return -1
        max_entries = max_bytes // PKDB_VALUE_SIZE
        if max_entries == 0:
            click.echo("Error: Memory limit is too low", err=True)
            return -1
        click.echo(
            f"Max-RAM provided: will be loaded not more than "
            f"{to_human_readable(max_entries)} phylo-k-mers."
        )

    click.echo(f"Loading database with mu={mu:g} and omega={omega:g}...")
    try:
        db = load(database, mu=mu, user_omega=omega, max_entries=max_entries)
    except ValueError as e:
        click.echo(f"Error: {e}", err=True)
        return -1

    if db.sequence_type != states:
        click.echo(
            f"Error: database is {db.sequence_type} but -s {states} was requested",
            err=True,
        )
        return -1

    click.echo("Database parameters:")
    click.echo(f"\tSequence type: {db.sequence_type}")
    click.echo(f"\tk: {db.kmer_size}")
    click.echo(f"\tomega: {db.omega:g}")
    click.echo(f"\tPositions loaded: {'true' if db.positions_loaded else 'false'}")
    click.echo("")
    click.echo(
        f"Loaded {to_human_readable(db.get_num_entries_loaded())} of "
        f"{to_human_readable(db.get_num_entries_total())} phylo-k-mers. "
    )
    click.echo("")

    tree = parse_newick(db.tree())
    if engine == "reference":
        from ..engine.reference import ReferencePlacer

        placer = ReferencePlacer(db, tree, keep_at_most=keep_at_most, keep_factor=keep_factor)
        engine_name = "scalar (oracle)"
    elif engine == "native":
        # CPU-only deployments: the C++ scalar placer with the reference's
        # -j/--threads OpenMP placement loop (place.cpp:218-229) as a full
        # engine -- no JAX device required
        from ..native import NativePlacer

        placer = NativePlacer(db, tree, keep_at_most=keep_at_most,
                              keep_factor=keep_factor,
                              threads=max(1, threads))
        engine_name = f"native C++ scalar (-j {max(1, threads)})"
    elif engine == "sharded":
        import jax

        from ..engine.placer import PlacerConfig
        from ..parallel.mesh import init_distributed, make_mesh
        from ..parallel.sharding import ShardedJaxPlacer

        if coordinator or num_processes:
            # multi-host launch: one CLI invocation per process, a shared
            # coordinator, one global mesh (SURVEY.md section 5.8 --
            # green-field vs the single-process reference)
            init_distributed(coordinator, num_processes=num_processes,
                             process_id=process_id,
                             initialization_timeout=collective_timeout)
        mesh = make_mesh(n_model=n_model)
        cfg = PlacerConfig(host_threads=max(1, threads), precision=precision,
                           plane_mode=plane_mode, pair_plane=pair_plane,
                           tile_payload=tile_payload)
        placer = ShardedJaxPlacer(db, tree, mesh, keep_at_most=keep_at_most,
                                  keep_factor=keep_factor, config=cfg)
        engine_name = (
            f"jax/{jax.default_backend()} sharded mesh "
            f"{mesh.shape['data']}x{mesh.shape['model']}"
        )
    else:
        from ..engine.placer import JaxPlacer, PlacerConfig

        cfg = PlacerConfig(host_threads=max(1, threads), precision=precision,
                           plane_mode=plane_mode, pair_plane=pair_plane,
                           tile_payload=tile_payload)
        placer = JaxPlacer(db, tree, keep_at_most=keep_at_most,
                           keep_factor=keep_factor, config=cfg)
        import jax

        engine_name = f"jax/{jax.default_backend()} ({len(jax.devices())} device(s))"

    tree_as_newick = to_newick(tree, jplace_edges=True)
    jplace_filename = make_output_filename(input_file, outputdir)
    if invocation is None:
        invocation = make_invocation(sys.argv)
    total_fasta_size = os.path.getsize(input_file)

    writer = jplace_writer(jplace_filename, invocation, tree_as_newick, resume=resume)
    writer.start()
    if writer.resumed_reads:
        click.echo(f"Resuming: {writer.resumed_reads} reads already placed.")

    click.echo(f"Engine: {engine_name}")  # analog of print_intruction_set (main.cpp:50-63)
    click.echo(f"Placing {input_file}...")

    bar = ProgressBar(total_fasta_size)
    begin = time.monotonic()

    # prefer the native C++ FASTA reader when the library is built
    # (the Python reader handles gzip; the native one does not)
    reader = None
    with open(input_file, "rb") as _probe:
        is_gzip = _probe.read(2) == b"\x1f\x8b"
    if not is_gzip:
        try:
            from ..native import NativeFastaReader, native_available

            if native_available():
                reader = NativeFastaReader(input_file, batch_size)
        except Exception:
            reader = None
    if reader is None:
        reader = batch_fasta(input_file, batch_size)
    if writer.resumed_reads:
        reader = _SkippingReader(reader, writer.resumed_reads)

    def progress(seq_per_second, num_seq_placed, bytes_read):
        bar.update(
            bytes_read,
            prefix=f"{to_human_readable(seq_per_second)} seq/s ",
            postfix=f"{num_seq_placed} / ?",
        )

    from ..engine.pipeline import run_pipeline

    # multi-host: a dead peer leaves this process blocked inside an XLA
    # collective; the watchdog turns that into a STALL_EXIT_CODE exit so a
    # supervisor can restart every rank with --resume (the per-batch
    # jplace sidecar makes restart cheap; parallel/mesh.py)
    dog = None
    if num_processes and num_processes > 1:
        from ..parallel.mesh import BatchWatchdog

        dog = BatchWatchdog(collective_timeout, rank=process_id)
        inner_place = placer.place

        class _Guarded:
            def place(self, batch):
                dog.arm(f"batch of {len(batch)}")
                try:
                    return inner_place(batch)
                finally:
                    dog.disarm()

        guarded = _Guarded()
        guarded_placer, placer = placer, guarded
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
    try:
        stats = run_pipeline(placer, reader, writer, progress=progress,
                             inflight=inflight)
    finally:
        if dog is not None:
            dog.stop()
        if profile_dir:
            import jax

            jax.profiler.stop_trace()
    writer.end()
    if verbose:
        click.echo(f"Pipeline: {stats.summary()}")

    bar.update(reader.bytes_read(), prefix="Done. ",
               postfix=to_human_readable(stats.num_seq_placed))
    bar.finish()

    click.echo(
        f"Placed {stats.num_seq_placed} sequences.\n"
        f"Average speed: {to_human_readable(stats.average_speed)} seq/s."
    )
    click.echo(f"Output: {jplace_filename}")
    placement_time = int((time.monotonic() - begin) * 1000)
    click.echo(f"Placement time: {humanize_time(placement_time)} ({placement_time} ms)")
    click.echo("Done.")
    return 0


@epik.command()
@click.argument("jplace1", type=click.Path(exists=True))
@click.argument("jplace2", type=click.Path(exists=True))
@click.option("--only-best", is_flag=True, default=False)
def diff(jplace1, jplace2, only_best):
    """Semantic diff of two jplace files (the parity oracle,
    reference: scripts/jplace_diff.py)."""
    from ..tools.jplace_diff import jplace_diff

    res = jplace_diff(jplace1, jplace2, only_best=only_best)
    for m in res.mismatches[:200]:
        click.echo(m)
    click.echo(f"\n{res.num_matches}/{res.num_seqs} placements match.")
    if not res.clean:
        raise SystemExit(1)


@epik.command()
@click.argument("database", type=click.Path(exists=True))
def probe(database):
    """Diagnose an .ipk file's layout (field-by-field walk + hexdumps).

    The recovery tool for UnverifiedFormatError: prints every field of the
    reconstructed layout with its byte offset under both 64- and 32-bit
    size_t conventions, the failure site, and landmark scans (see
    io/ipk_boost.py::probe_ipk)."""
    from ..io.ipk_boost import probe_ipk

    click.echo(probe_ipk(database))


@epik.command()
@click.argument("src", type=click.Path(exists=True))
@click.argument("dst", type=click.Path())
def convert(src, dst):
    """Convert a database between .ipk (reconstructed Boost layout,
    UNVERIFIED -- see io/ipk_boost.py) and the native .eptk format."""
    from ..io.db import load, save
    from ..io.ipk_boost import UnverifiedFormatError, read_ipk, write_ipk

    if src.endswith(".eptk"):
        db = load(src)
    else:
        try:
            db = read_ipk(src)
        except UnverifiedFormatError as e:
            click.echo(f"Error reading {src}: {e}", err=True)
            click.echo(
                "Note: the .ipk reader implements a reconstructed layout; the "
                "i2l serialization source was unavailable. Re-export with IPK "
                "or use .eptk.", err=True,
            )
            raise SystemExit(1)
    if dst.endswith(".ipk"):
        write_ipk(db, dst)
    else:
        save(db, dst)
    click.echo(
        f"Converted {src} -> {dst}: {db.num_kmers} k-mers, "
        f"{db.num_entries} entries, k={db.kmer_size}, {db.sequence_type}"
    )


@epik.command()
@click.argument("database", type=click.Path(exists=True))
def stats(database):
    """Print database parameters (the driver's stdout block,
    reference: main.cpp:285-292) without placing anything."""
    from ..io.db import load as load_db

    db = load_db(database)
    click.echo("Database parameters:")
    click.echo(f"\tSequence type: {db.sequence_type}")
    click.echo(f"\tk: {db.kmer_size}")
    click.echo(f"\tomega: {db.omega:g}")
    click.echo(f"\tPositions loaded: {'true' if db.positions_loaded else 'false'}")
    click.echo(f"\tk-mers: {db.num_kmers}")
    click.echo(f"\tEntries: {to_human_readable(db.get_num_entries_total())}")
    click.echo(f"\tMax posting list: {db.max_posting_len()}")
    from ..core.tree import parse_newick as _pn

    tree = _pn(db.tree())
    click.echo(f"\tTree: {len(tree.leaves())} leaves, {tree.get_node_count()} nodes")


@epik.command("build-db")
@click.option("--tree", "tree_file", required=True, type=click.Path(exists=True),
              help="Reference tree (newick).")
@click.option("--entries", "entries_file", required=True, type=click.Path(exists=True),
              help="JSON file: {kmer: [[branch, log10_score], ...], ...}.")
@click.option("-k", "--kmer-size", type=int, required=True)
@click.option("--omega", type=float, default=1.5, show_default=True)
@click.option("-s", "--states", type=click.Choice(["nucl", "amino"]), default="nucl",
              show_default=True)
@click.argument("output", type=click.Path())
def build_db_cmd(tree_file, entries_file, kmer_size, omega, states, output):
    """Build a .eptk database from explicit phylo-k-mer scores.

    Database construction from alignments is IPK's job (out of scope for
    the reference placement tool too, reference README.md:113); this
    command packages externally computed phylo-k-mer scores.
    """
    import json as _json

    from ..io.build import build_db
    from ..io.db import save

    with open(entries_file) as f:
        raw = _json.load(f)
    entries = {k: [(int(b), float(sc)) for b, sc in v] for k, v in raw.items()}
    with open(tree_file) as f:
        newick = f.read().strip()
    db = build_db(entries, newick, kmer_size=kmer_size, omega=omega,
                  sequence_type=states)
    save(db, output)
    click.echo(f"Wrote {output}: {db.num_kmers} k-mers, {db.num_entries} entries")


@epik.command()
@click.option("--config", type=click.Path(exists=True), default=None,
              help="JSON case config (default: built-in cases)")
@click.option("--workdir", default="/tmp/epik_tpu_ppdiff")
def ppdiff(config, workdir):
    """Two-implementation differential harness
    (the pattern of reference: scripts/ppdiff.py)."""
    from ..tools.ppdiff import main as ppdiff_main

    args = ["--workdir", workdir]
    if config:
        args += ["--config", config]
    raise SystemExit(ppdiff_main(args))


if __name__ == "__main__":
    epik()
