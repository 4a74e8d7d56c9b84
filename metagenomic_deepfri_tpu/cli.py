"""Command-line interface.

Verb-for-verb parity with the reference CLI (reference ``mDeepFRI/cli.py``):
``get-models`` (:244-268), ``generate-config`` (:271-300),
``search-databases`` (:303-335), ``predict-function`` (:338-497),
``make-cmaps`` (:500-530), with the same shared ``search_options`` flag set
(:96-221), default thresholds (the clinical-grade foldseek-paper values), and
the full-help-on-usage-error patch (:67-92). Adds ``benchmark`` (device
throughput) — the reference keeps its benchmarks out-of-package.
"""

from __future__ import annotations

import logging
import os
import sys
from functools import wraps
from pathlib import Path

import click
import numpy as np
from click.exceptions import UsageError

from metagenomic_deepfri_tpu import __version__

logger = logging.getLogger(__name__)


def setup_logging(debug: bool = False):
    """Root logger configuration (reference cli.py:46-56)."""
    logging.basicConfig(
        level=logging.DEBUG if debug else logging.INFO,
        format="%(asctime)s %(levelname)-7s %(name)s :: %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%S",
        handlers=[logging.StreamHandler(sys.stdout)],
        force=True,
    )


def log_command_params(ctx: click.Context):
    """Dump invocation parameters to the log (reference cli.py:59-64)."""
    logger.info("Command parameters:")
    max_key_len = max(len(k) for k in ctx.params)
    for key, value in ctx.params.items():
        logger.info(f"{key:<{max_key_len + 2}} : {value}")


def patch_usage_error():
    """Print the full help before a usage error (reference cli.py:67-92)."""
    original_show = UsageError.show

    def _show_with_help(self, file=None):
        if self.ctx is not None:
            click.echo(self.ctx.get_help() + "\n", file=file,
                       color=self.ctx.color)
        original_show(self, file=file)

    UsageError.show = _show_with_help


def search_options(function):
    """Shared search flags (reference cli.py:96-221; defaults from
    https://doi.org/10.1038/s41586-023-06510-w)."""

    @click.option("--shard", default=None, type=str,
                  help="'I/N': process only this host's deterministic slice "
                       "of the input catalogue (multi-host runs; merge the "
                       "per-host outputs with `merge-results`).")
    @click.option("--tmpdir", default=None,
                  type=click.Path(exists=False, file_okay=False,
                                  dir_okay=True, path_type=Path),
                  help="Path to a temporary directory. Required for very "
                       "large searches.")
    @click.option("--skip-pdb", default=False, is_flag=True,
                  help="Skip PDB100 database search.")
    @click.option("-t", "--threads", default=1, type=int, show_default=True,
                  help="Number of threads to use.")
    @click.option("--overwrite", default=False, is_flag=True,
                  help="Overwrite existing files.")
    @click.option("--top-k", default=5, type=int, show_default=True,
                  help="Number of top search hits to save.")
    @click.option("--mmseqs-min-coverage", default=0.9, type=float,
                  show_default=True,
                  help="Minimum coverage for search hits (query and target).")
    @click.option("--mmseqs-min-identity", default=0.5, type=float,
                  show_default=True,
                  help="Minimum identity for search hits.")
    @click.option("--mmseqs-max-evalue", default=0.001, type=float,
                  show_default=True, help="Maximum e-value for search hits.")
    @click.option("--mmseqs-min-bitscore", default=0, type=float,
                  show_default=True, help="Minimum bitscore for search hits.")
    @click.option("--max-length", default=None, type=int,
                  help="Maximum length of the protein sequence.")
    @click.option("--min-length", default=None, type=int,
                  help="Minimum length of the protein sequence.")
    @click.option("-s", "--mmseqs-sensitivity", default=5.7,
                  type=click.FloatRange(1, 7.5), show_default=True,
                  help="Sensitivity of the MMseqs2 search.")
    @click.option("-d", "--db-path", required=False,
                  type=click.Path(exists=True, dir_okay=True, file_okay=True,
                                  path_type=Path),
                  multiple=True,
                  help="Path to a structures database (FoldComp, FASTA, or "
                       "a directory of .pdb/.cif[.gz] files).")
    @click.option("-o", "--output", required=True,
                  type=click.Path(exists=False, path_type=Path),
                  help="Path to output file or directory.")
    @click.option("-i", "--input", required=True,
                  type=click.Path(exists=True, dir_okay=False, readable=True,
                                  path_type=Path),
                  help="Path to input protein sequences (FASTA file, may be "
                       "gzipped).")
    @wraps(function)
    def wrapper(*args, **kwargs):
        return function(*args, **kwargs)

    return wrapper


@click.group()
@click.option("--debug/--no-debug", default=False)
@click.version_option(version=__version__)
def main(debug):
    """metagenomic-deepfri-tpu — TPU-native protein function annotation."""
    for log in [logging.getLogger(name)
                for name in logging.root.manager.loggerDict]:
        log.setLevel(logging.DEBUG if debug else logging.INFO)
    patch_usage_error()
    setup_logging(debug)
    # NOTE: the persistent compile cache is enabled by the components that
    # actually initialise the JAX backend (engine construction, training,
    # benches) — doing it here would force backend init for pure-HTTP
    # verbs like get-models/get-binaries.


@main.command()
@click.option("-o", "--output", required=True,
              type=click.Path(file_okay=False, dir_okay=True, writable=True,
                              path_type=Path),
              help="Path to folder where the model weights will be "
                   "downloaded.")
@click.option("-v", "--version", required=True,
              type=click.Choice(["1.0", "1.1"]), help="Version of the model.")
def get_models(output, version):
    """Download model weights (ONNX + vocabularies) for DeepFRI."""
    from metagenomic_deepfri_tpu.utils import (download_model_weights,
                                               generate_config_json)

    logger.info("Downloading DeepFRI models.")
    output_path = Path(output)
    output_path.mkdir(parents=True, exist_ok=True)
    download_model_weights(output_path, version)
    generate_config_json(output_path, version)
    logger.info("DeepFRI models v%s downloaded to %s.", version, output_path)


@main.command("get-binaries")
@click.option("-o", "--output", default=None,
              type=click.Path(file_okay=False, dir_okay=True,
                              path_type=Path),
              help="Install directory (default: ~/.local/share/mdeepfri/bin,"
                   " override with MDEEPFRI_TOOLS_DIR).")
@click.option("--tools", default="mmseqs,foldcomp", show_default=True,
              help="Comma-separated subset of: mmseqs, foldcomp.")
def get_binaries(output, tools):
    """Download the external mmseqs/foldcomp engines for this CPU.

    The reference vendors these binaries at build time (its setup.py
    downloads per-arch tarballs from mmseqs.com); this verb fetches the
    same builds on demand into a tools directory that binary discovery
    checks automatically. Without them the package still works — built-in
    k-mer search, FASTA / PDB-directory databases — but FoldComp (.fcz)
    databases require foldcomp.
    """
    from metagenomic_deepfri_tpu.search.binaries import fetch_binaries

    wanted = [t.strip() for t in tools.split(",") if t.strip()]
    installed = fetch_binaries(output, wanted)
    for tool, path in installed.items():
        click.echo(f"{tool}: {path}")


@main.command()
@click.option("-w", "--weights_path", required=True,
              type=click.Path(exists=True, dir_okay=True, file_okay=False,
                              path_type=Path),
              help="Path to a folder containing model weights.")
@click.option("-v", "--version", required=True,
              type=click.Choice(["1.0", "1.1"]), help="Version of the model.")
def generate_config(weights_path, version):
    """Generate model_config.json for manually downloaded weights."""
    from metagenomic_deepfri_tpu.utils import generate_config_json

    logger.info("Generating config file.")
    generate_config_json(Path(weights_path), version)
    logger.info("Config file generated in %s.", weights_path)


@main.command()
@search_options
@click.pass_context
def search_databases(ctx, input, output, db_path, shard, mmseqs_sensitivity,
                     min_length, max_length, mmseqs_min_bitscore,
                     mmseqs_max_evalue, mmseqs_min_identity,
                     mmseqs_min_coverage, top_k, overwrite, threads, skip_pdb,
                     tmpdir):
    """Hierarchically search structure databases for similar proteins."""
    from metagenomic_deepfri_tpu.pipeline import (
        hierarchical_database_search, load_query_file)

    log_command_params(ctx)
    query_file = load_query_file(query_file=input, min_length=min_length,
                                 max_length=max_length, shard=shard)
    hierarchical_database_search(query_file=query_file,
                                 databases=db_path,
                                 output_path=output,
                                 mmseqs_sensitivity=mmseqs_sensitivity,
                                 min_bits=mmseqs_min_bitscore,
                                 max_eval=mmseqs_max_evalue,
                                 min_ident=mmseqs_min_identity,
                                 min_coverage=mmseqs_min_coverage,
                                 top_k=top_k,
                                 skip_pdb=skip_pdb,
                                 overwrite=overwrite,
                                 tmpdir=tmpdir,
                                 threads=threads)


@main.command()
@search_options
@click.option("-w", "--weights", required=True,
              type=click.Path(exists=True, dir_okay=True, file_okay=False,
                              path_type=Path),
              help="Path to a folder containing model weights.")
@click.option("-p", "--processing-modes", default=["bp", "cc", "ec", "mf"],
              type=click.Choice(["bp", "cc", "ec", "mf"]), multiple=True,
              help="Processing modes. Default is all (biological process, "
                   "cellular component, enzyme commission, molecular "
                   "function).")
@click.option("-a", "--angstrom-contact-thresh", default=6, type=float,
              help="Angstrom contact threshold. Default is 6.")
@click.option("--generate-contacts", default=2, type=int,
              help="Gap fill threshold during contact map alignment.")
@click.option("--alignment-gap-open", default=10, type=int,
              help="Gap open penalty for alignment.")
@click.option("--alignment-gap-extend", default=1, type=int,
              help="Gap extend penalty for alignment.")
@click.option("--remove-intermediate", default=False, is_flag=True,
              help="Remove intermediate files.")
@click.option("--save-structures", default=False, is_flag=True,
              help="Save structures of the top hits.")
@click.option("--save-cmaps", default=False, is_flag=True,
              help="Save contact maps of the top hits.")
@click.option("--skip-matrix", default=False, is_flag=True,
              help="Skip writing prediction matrix files (saves disk space).")
@click.option("--scoring-matrix", default="auto", type=str,
              show_default=True,
              help="Scoring matrix for sequence alignment (name or NCBI "
                   "matrix file).")
@click.option("--propagate-go-terms", default=False, is_flag=True,
              help="Propagate GO terms up the ontology DAG (true-path rule).")
@click.option("--obo-path", default=None,
              type=click.Path(dir_okay=False, path_type=Path),
              help="Path to a GO OBO file (go-basic.obo); downloaded "
                   "automatically when needed if not provided.")
@click.pass_context
def predict_function(ctx, input, db_path, weights, output, shard,
                     processing_modes,
                     angstrom_contact_thresh, generate_contacts,
                     mmseqs_sensitivity, mmseqs_min_bitscore,
                     mmseqs_max_evalue, mmseqs_min_identity,
                     mmseqs_min_coverage, top_k, alignment_gap_open,
                     alignment_gap_extend, remove_intermediate, overwrite,
                     threads, skip_pdb, min_length, max_length, tmpdir,
                     save_structures, save_cmaps, skip_matrix, scoring_matrix,
                     propagate_go_terms, obo_path):
    """Predict protein function from sequence (full pipeline)."""
    from metagenomic_deepfri_tpu.pipeline import (
        hierarchical_database_search, load_query_file,
        predict_protein_function)

    logger.info("Starting metagenomic-deepfri-tpu.")
    output_path = Path(output)
    output_path.mkdir(parents=True, exist_ok=True)
    log_command_params(ctx)

    query_file = load_query_file(query_file=input, min_length=min_length,
                                 max_length=max_length, shard=shard)
    deepfri_dbs = hierarchical_database_search(
        query_file=query_file,
        output_path=output_path / "database_search",
        databases=db_path,
        mmseqs_sensitivity=mmseqs_sensitivity,
        min_bits=mmseqs_min_bitscore,
        max_eval=mmseqs_max_evalue,
        min_ident=mmseqs_min_identity,
        min_coverage=mmseqs_min_coverage,
        top_k=top_k,
        skip_pdb=skip_pdb,
        overwrite=overwrite,
        tmpdir=tmpdir,
        threads=threads)

    # refresh the query file: the search mutates it (reference cli.py:473-479)
    query_file = load_query_file(query_file=input, min_length=min_length,
                                 max_length=max_length, shard=shard)

    predict_protein_function(
        query_file=query_file,
        databases=tuple(deepfri_dbs),
        weights=weights,
        output_path=output_path,
        deepfri_processing_modes=list(processing_modes),
        angstrom_contact_threshold=angstrom_contact_thresh,
        generate_contacts=generate_contacts,
        alignment_gap_open=alignment_gap_open,
        alignment_gap_continuation=alignment_gap_extend,
        remove_intermediate=remove_intermediate,
        threads=threads,
        save_structures=save_structures,
        save_cmaps=save_cmaps,
        skip_matrix=skip_matrix,
        scoring_matrix=scoring_matrix,
        propagate_go_terms=propagate_go_terms,
        obo_path=obo_path)


@main.command()
@click.option("--input_dir", "-i", type=click.Path(exists=True),
              required=True, help="Directory containing PDB or mmCIF files.")
@click.option("--output_dir", "-o", type=click.Path(), required=True,
              help="Directory to save computed contact maps.")
@click.option("--threshold", "-t", default=6.0, show_default=True,
              help="Distance threshold in Å for contact map.")
def make_cmaps(input_dir, output_dir, threshold):
    """Compute CA contact maps for all PDB/mmCIF files in a directory."""
    from metagenomic_deepfri_tpu.bio_utils import (calculate_contact_map,
                                                   get_residues_coordinates,
                                                   load_structure)

    os.makedirs(output_dir, exist_ok=True)
    for fname in os.listdir(input_dir):
        if not fname.endswith((".pdb", ".cif")):
            continue
        filetype = "pdb" if fname.endswith(".pdb") else "mmcif"
        with open(os.path.join(input_dir, fname), encoding="utf-8") as f:
            structure_str = f.read()
        residues, coords = get_residues_coordinates(
            load_structure(structure_str, filetype), chain="A")
        cmap = calculate_contact_map(coords, threshold)
        # Divergence from reference cli.py:517-531, which only strips a
        # ".pdb" suffix so an mmCIF input saves as "X.cif.npy"; we strip
        # whichever structure extension the input actually has.
        stem = fname[:-4] if fname.endswith((".pdb", ".cif")) else fname
        np.save(os.path.join(output_dir, stem + "_cmap.npy"), cmap)


@main.command()
@click.option("--weights", "-w", required=True,
              type=click.Path(exists=True, path_type=Path),
              help="Path to the folder containing model weights.")
@click.option("-d", "--db-path", multiple=True,
              type=click.Path(exists=True, path_type=Path),
              help="Structure database(s): FoldComp, FASTA, or a directory "
                   "of .pdb/.cif files. Omit for sequence-only (CNN) "
                   "serving.")
@click.option("--socket", "socket_path", required=True,
              type=click.Path(path_type=Path),
              help="Unix socket path to listen on.")
@click.option("-p", "--processing-modes", multiple=True,
              type=click.Choice(["bp", "cc", "mf", "ec"]),
              help="Modes to serve (default: all in model_config.json).")
@click.option("-t", "--threads", default=1, type=int, show_default=True)
@click.option("--top-k", default=5, type=int, show_default=True)
@click.option("--mmseqs-max-evalue", default=1e-5, type=float,
              show_default=True)
@click.option("--mmseqs-min-identity", default=0.5, type=float,
              show_default=True)
@click.option("--mmseqs-min-coverage", default=0.9, type=float,
              show_default=True)
@click.option("--obo", "obo_path", default=None,
              type=click.Path(exists=True, path_type=Path),
              help="go-basic.obo file: responses gain per-protein "
                   "propagated_scores (true-path GO propagation, the "
                   "serving analogue of results_propagated.tsv).")
def serve(weights, db_path, socket_path, processing_modes, threads, top_k,
          mmseqs_max_evalue, mmseqs_min_identity, mmseqs_min_coverage,
          obo_path):
    """Run a resident annotation server on a Unix socket (JSONL protocol).

    Models stay on device and databases stay indexed between requests —
    the serving counterpart of the batch `predict-function` verb. Protocol:
    one JSON object per line, {"proteins": {id: sequence, ...}} in,
    {"results": ..., "skipped": ...} out.
    """
    from metagenomic_deepfri_tpu.serving import AnnotationServer

    server = AnnotationServer(
        weights,
        databases=list(db_path),
        processing_modes=list(processing_modes) or None,
        max_eval=mmseqs_max_evalue,
        min_ident=mmseqs_min_identity,
        min_coverage=mmseqs_min_coverage,
        top_k=top_k,
        threads=threads,
        obo_path=obo_path)
    server.serve_unix(socket_path)


@main.command()
@click.option("--weights", "-w", required=True,
              type=click.Path(exists=True, path_type=Path),
              help="Base model weights folder (model_config.json layout).")
@click.option("-m", "--mode", required=True,
              type=click.Choice(["bp", "cc", "mf", "ec"]),
              help="Ontology mode whose GCN to fine-tune.")
@click.option("-i", "--structures", required=True,
              type=click.Path(exists=True, file_okay=False, path_type=Path),
              help="Directory of labelled .pdb/.cif structure files.")
@click.option("-l", "--labels", required=True,
              type=click.Path(exists=True, dir_okay=False, path_type=Path),
              help="TSV: protein<TAB>GO:...;GO:... per line.")
@click.option("-o", "--output", required=True,
              type=click.Path(path_type=Path),
              help="Output directory for the fine-tuned checkpoint/ONNX.")
@click.option("--epochs", default=5, type=int, show_default=True)
@click.option("--learning-rate", default=1e-4, type=float, show_default=True)
@click.option("--batch-size", default=8, type=int, show_default=True)
@click.option("--model-parallel", default=1, type=int, show_default=True,
              help="Tensor-parallel size of the device mesh (rest is DP).")
@click.option("--angstrom-contact-thresh", default=6.0, type=float,
              show_default=True)
@click.option("--seed", default=0, type=int, show_default=True)
def finetune(weights, mode, structures, labels, output, epochs,
             learning_rate, batch_size, model_parallel,
             angstrom_contact_thresh, seed):
    """Fine-tune a GCN on labelled structures (mesh-sharded train step).

    Writes a native .npz checkpoint plus an ONNX re-export + params JSON,
    so the result plugs back into the inference registry.
    """
    from metagenomic_deepfri_tpu.training import finetune as run_finetune

    path = run_finetune(weights, mode, structures, labels, output,
                        epochs=epochs, learning_rate=learning_rate,
                        batch_size=batch_size,
                        contact_threshold=angstrom_contact_thresh,
                        model_parallel=model_parallel, seed=seed)
    click.echo(f"Fine-tuned checkpoint written to {path}")


@main.command("merge-results")
@click.argument("shard_dirs", nargs=-1, required=True,
                type=click.Path(exists=True, file_okay=False,
                                path_type=Path))
@click.option("-o", "--output", required=True,
              type=click.Path(path_type=Path),
              help="Directory for the merged catalogue-level results.")
def merge_results(shard_dirs, output):
    """Merge per-host `--shard I/N` pipeline outputs into one directory."""
    from metagenomic_deepfri_tpu.parallel.multihost import merge_shard_results

    merged = merge_shard_results(shard_dirs, output)
    for path in merged:
        click.echo(str(path))


@main.command("verify-weights")
@click.option("--weights", "-w", required=True,
              type=click.Path(exists=True),
              help="Path to the folder containing model weights.")
@click.option("--n-proteins", default=10, type=int, show_default=True,
              help="Random proteins per model.")
@click.option("--tolerance", default=1e-4, type=float, show_default=True,
              help="Max allowed abs score difference JAX vs ONNX.")
@click.option("--logit-tolerance", default=None, type=float,
              help="Max allowed abs PRE-softmax logit difference "
                   "(defaults to --tolerance); the sharp oracle.")
@click.option("--trace", is_flag=True,
              help="On failure, log a per-stage divergence report "
                   "(embed/gc*/pooled/fc*/logits) to localise the culprit.")
@click.option("--seed", default=0, type=int, show_default=True)
def verify_weights_cmd(weights, n_proteins, tolerance, logit_tolerance,
                       trace, seed):
    """Check JAX-vs-ONNX numerical parity for every model in a weights dir.

    Mirrors the reference's ONNX-vs-TF2 conversion validation
    (weight_convert/README.md): each imported model's scores AND pre-softmax
    logits must match executing its actual ONNX graph on random proteins.
    """
    from metagenomic_deepfri_tpu.parity import verify_weights

    results = verify_weights(weights, n_proteins=n_proteins,
                             tolerance=tolerance,
                             logit_tolerance=logit_tolerance,
                             seed=seed, trace=trace)
    failed = [r for r in results if not r.ok]
    for r in results:
        click.echo(f"{r.net}/{r.mode}: scores max|diff|={r.max_abs_diff:.2e}"
                   f" logits max|diff|={r.max_logit_diff:.2e} "
                   f"({'OK' if r.ok else 'FAIL'})")
    if failed:
        raise click.ClickException(
            f"{len(failed)}/{len(results)} models exceed tolerance "
            f"{tolerance}")
    click.echo(f"All {len(results)} models within {tolerance}.")


@main.command()
@click.option("--bucket", default=512, type=int, show_default=True,
              help="Length bucket to benchmark.")
@click.option("--batches", default=8, type=int, show_default=True,
              help="Number of timed batches.")
@click.option("--n-labels", default=512, type=int, show_default=True)
def benchmark(bucket, batches, n_labels):
    """Measure GCN inference throughput (proteins/sec) on this device."""
    from metagenomic_deepfri_tpu.bench_utils import run_gcn_benchmark

    result = run_gcn_benchmark(bucket=bucket, batches=batches,
                               n_labels=n_labels)
    click.echo(result)


if __name__ == "__main__":
    main()
