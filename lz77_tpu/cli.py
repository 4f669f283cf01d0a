"""Command-line driver, flag-compatible with the reference binary.

Same surface as main.c:50-58: ``-c -d -i -o -l -s -h`` with identical
validation ranges (la in [2,255], sb in [0,65535] — main.c:35-38), identical
duplicate-flag rejection, plus TPU-build extensions that never leak into the
stream format: block size, batch size, matcher backend, stats report.

Divergence (SURVEY.md §2.3.8): sb values of 0, 1 or exact powers of two are
rejected by default because the reference encoder corrupts data for them;
``--force-sb`` accepts them anyway using the safe restricted distance limit.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from . import spec

# Verbatim usage text of the reference (main.c:118-125); printed by -h.
USAGE_TEXT = (
    "Usage: lz77 <options>\n"
    "  -c : Encode input file to output file.\n"
    "  -d : Decode input file to output file.\n"
    "  -i <filename> : Name of input file.\n"
    "  -o <filename> : Name of output file.\n"
    "  -l <value> : Lookahead size (default 15)\n"
    "  -s <value> : Search-buffer size (default 4095)\n"
    "  -h : Command line options.\n\n"
)


class _UsageAction(argparse.Action):
    """Print usage and KEEP PARSING, like the reference's ``case 'h'`` which
    ``break``s back into the getopt loop instead of exiting (main.c:117-126).
    ``lz77 -h`` alone therefore prints usage and then fails validation with
    "Input file must be provided", exactly like the C binary."""

    def __init__(self, option_strings, dest, **kwargs):
        super().__init__(option_strings, dest, nargs=0, **kwargs)

    def __call__(self, parser, namespace, values, option_string=None):
        print(USAGE_TEXT, end="")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lz77",
        description="TPU-native LZ77 codec (stream-compatible with cstdvd/lz77)",
        add_help=False,
    )
    p.add_argument("-c", dest="mode", action="store_const", const="encode",
                   help="Encode input file to output file.")
    p.add_argument("-d", dest="mode", action="store_const", const="decode",
                   help="Decode input file to output file.")
    p.add_argument("-i", dest="input", action="append",
                   help="Name of input file.")
    p.add_argument("-o", dest="output", action="append",
                   help="Name of output file.")
    p.add_argument("-l", dest="la", type=int, default=None,
                   help="Lookahead size (default 15)")
    p.add_argument("-s", dest="sb", type=int, default=None,
                   help="Search-buffer size (default 4095)")
    p.add_argument("-h", action=_UsageAction,
                   help="Command line options.")
    # TPU-build extensions (out-of-band: never affect the stream format).
    p.add_argument("--block-size", type=int, default=None,
                   help="Encoder block size in bytes (device parallel unit)")
    p.add_argument("--batch-blocks", type=int, default=None,
                   help="Blocks encoded per device batch")
    p.add_argument("--matcher",
                   choices=("brute", "chunked", "sorted", "pallas", "bitplane",
                            "pallas_bitplane"),
                   default="chunked",
                   help="Match-finder backend (all exact, same streams)")
    p.add_argument("--manifest", default=None,
                   help="Checkpoint manifest path (enables resumable encode)")
    p.add_argument("--resume", action="store_true",
                   help="Resume a previous encode from --manifest")
    p.add_argument("--backend", choices=("jax", "native", "numpy"),
                   default="jax", help="Execution backend")
    p.add_argument("--pipeline", choices=("host", "fused", "sharded"),
                   default="host",
                   help="jax-backend encode pipeline: 'host' = device match "
                        "+ host parse; 'fused' = device-resident "
                        "match+parse+pack (byte-aligned token widths); "
                        "'sharded' = the multi-chip pipeline over a device "
                        "mesh (see --mesh)")
    p.add_argument("--mesh", default=None, metavar="DATAxWIN",
                   help="Device mesh shape for --pipeline sharded, e.g. "
                        "'4x2' = 4-way data (block) axis x 2-way window "
                        "(distance) axis; default: all devices on the data "
                        "axis")
    p.add_argument("--decode-backend",
                   choices=("auto", "native", "host", "device"),
                   default="auto",
                   help="jax-backend decoder: 'auto' = fastest verified "
                        "host path; 'device' = the scalar-core walk kernel "
                        "(full -s range; the backend actually used is "
                        "recorded in --report)")
    p.add_argument("--threads", type=int, default=None,
                   help="Native-backend encoder threads. Default/1: streamed "
                        "O(window)-memory encode; >1: in-memory block-"
                        "parallel encoder (byte-identical streams either way)")
    p.add_argument("--force-sb", action="store_true",
                   help="Accept degenerate -s values the reference corrupts "
                        "(0/1/powers of two); encoded safely, not corruptly")
    p.add_argument("--report", action="store_true",
                   help="Print a JSON run report to stderr")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="Capture a jax.profiler device trace into DIR")
    p.add_argument("--platform", choices=("cpu", "tpu"), default=None,
                   help="Pin the JAX platform before backend init (wins "
                        "over plugin overrides — e.g. run --pipeline "
                        "sharded on CPU where a TPU plugin pins the "
                        "platform)")
    p.add_argument("--host-devices", type=int, default=None, metavar="N",
                   help="Expose N virtual host (CPU) devices so multi-chip "
                        "meshes run without hardware (implies --platform "
                        "cpu unless --platform is given); e.g. "
                        "'--host-devices 8 --pipeline sharded --mesh 4x2'")
    return p


def _apply_platform(args) -> None:
    """Pin platform/device-count BEFORE the first JAX backend init.

    Environment variables alone are not enough when a platform plugin
    re-pins ``jax_platforms`` at import (the axon TPU plugin does), so this
    both sets the env and updates the config after import — the same
    double-override tests/conftest.py uses, as a product flag.  Must run
    before anything imports jax for real work.
    """
    import os as os_lib

    if args.host_devices:
        if args.host_devices < 1:
            raise ValueError("--host-devices must be >= 1")
        os_lib.environ["XLA_FLAGS"] = (
            os_lib.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.host_devices}"
        )
        if args.platform is None:
            args.platform = "cpu"
    if args.platform:
        os_lib.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)


def main(argv: list[str] | None = None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    # Reference-compatible validation (main.c:82-95, 101-115, 132-139).
    if args.input and len(args.input) > 1:
        print("Multiple input files not allowed.", file=sys.stderr)
        return 1
    if args.output and len(args.output) > 1:
        print("Multiple output files not allowed.", file=sys.stderr)
        return 1
    if args.la is not None and not (
        spec.MIN_LA_SIZE <= args.la <= spec.MAX_LA_SIZE
    ):
        print("Bad lookahead size value.", file=sys.stderr)
        return 1
    if args.sb is not None and not (0 <= args.sb <= spec.MAX_SB_SIZE):
        print("Bad search-buffer size value.", file=sys.stderr)
        return 1
    if not args.input:
        print("Input file must be provided", file=sys.stderr)
        return 1
    if not args.output:
        print("Output file must be provided", file=sys.stderr)
        return 1
    if args.mode is None:
        print("Select ENCODE or DECODE mode", file=sys.stderr)
        return 1
    # Our divergence check runs LAST so every reference-compatible validation
    # error above fires in the reference's order (main.c:69-139 has no
    # degenerate-sb concept at all).
    if args.sb is not None and spec.is_degenerate_sb(args.sb):
        if not args.force_sb or args.sb < 1:
            print(
                f"Search-buffer size {args.sb} is degenerate: the reference "
                "encoder corrupts data for 0, 1 and powers of two "
                "(bitof(2^k)=k cannot hold offset 2^k). Use a non-power "
                "size, or --force-sb to encode safely anyway.",
                file=sys.stderr,
            )
            return 1

    la = args.la if args.la is not None else spec.DEFAULT_LA_SIZE
    sb = args.sb if args.sb is not None else spec.DEFAULT_SB_SIZE
    params = spec.Params(la=la, sb=sb)

    try:
        _apply_platform(args)  # must precede any real jax work
    except ValueError as e:
        print(str(e), file=sys.stderr)
        return 1

    if (
        args.mode == "decode"
        and args.decode_backend != "auto"
        and args.backend in ("native", "numpy")
    ):
        print(
            f"warning: --decode-backend {args.decode_backend} only applies "
            f"to --backend jax; ignored with --backend {args.backend}",
            file=sys.stderr,
        )

    # Probe the input for the reference-compatible open error without
    # reading it: the streamed paths below read it in bounded chunks.
    try:
        open(args.input[0], "rb").close()
    except OSError as e:
        print(f"Opening input file: {e.strerror}", file=sys.stderr)
        return 1

    t0 = time.perf_counter()
    # Streamed file-to-file decode (the default decode route): O(window)
    # memory for any stream size, like the reference (lz77.c:148-197).
    if args.mode == "decode" and (
        args.backend == "native"
        or (args.backend == "jax"
            and args.decode_backend in ("auto", "native", "device"))
    ):
        from . import native as native_lib

        try:
            if args.backend == "jax" and args.decode_backend == "device":
                # streamed DEVICE decode: ring state carried across kernel
                # invocations, bounded host memory at any stream size
                from .models import codec

                st = codec.DecodeStats()
                n_out = codec.decode_file(
                    args.input[0], args.output[0], backend="device",
                    stats=st,
                )
                in_bytes = st.input_bytes
                backend_used = st.backend
            elif native_lib.available():
                # Pure-native streamed route: no jax import on the decode
                # hot path (matters for CLI latency on small files).
                import os as os_lib

                in_bytes = os_lib.path.getsize(args.input[0])
                n_out = native_lib.decode_file(args.input[0], args.output[0])
                backend_used = "native-streamed"
            else:
                from .models import codec

                st = codec.DecodeStats()
                n_out = codec.decode_file(
                    args.input[0], args.output[0],
                    backend="native" if args.backend == "native"
                    else args.decode_backend,
                    stats=st,
                )
                in_bytes = st.input_bytes
                backend_used = st.backend
        except OSError as e:
            print(f"Opening output file: {e.strerror}", file=sys.stderr)
            return 1
        except (ValueError, RuntimeError) as e:
            print(f"Error reading bits: {e}", file=sys.stderr)
            return 1
        if args.report:
            dt = time.perf_counter() - t0
            print(json.dumps({
                "mode": "decode", "backend": args.backend,
                "decode_backend": backend_used,
                "seconds": round(dt, 6), "input_bytes": in_bytes,
                "output_bytes": n_out,
                "mb_per_s": round(n_out / dt / 1e6, 3) if dt > 0 else None,
                "peak_rss_mb": _peak_rss_mb(),
            }), file=sys.stderr)
        return 0

    # native-backend encode streams file-to-file in O(window) memory (the
    # reference's FILE-loop profile, lz77.c:51-140) unless the caller asks
    # for the in-memory block-parallel path with --threads > 1.  Streams
    # are byte-identical either way.
    if (
        args.mode == "encode"
        and args.backend == "native"
        and args.threads in (None, 1)
    ):
        from . import native as native_lib

        try:
            n_in, n_out = native_lib.encode_file(
                args.input[0], args.output[0], params
            )
        except OSError as e:
            print(f"Opening output file: {e.strerror}", file=sys.stderr)
            return 1
        except (ValueError, RuntimeError) as e:
            print(f"Encode error: {e}", file=sys.stderr)
            return 1
        if args.report:
            dt = time.perf_counter() - t0
            print(json.dumps({
                "mode": "encode", "backend": "native-streamed",
                "seconds": round(dt, 6), "input_bytes": n_in,
                "output_bytes": n_out,
                "ratio": round(n_out / n_in, 6) if n_in else None,
                "mb_per_s": round(n_in / dt / 1e6, 3) if dt > 0 else None,
                "peak_rss_mb": _peak_rss_mb(),
            }), file=sys.stderr)
        return 0

    # jax-backend encode streams file-to-file (memmap input + page release,
    # payload appended as batches land — bounded memory at any input size,
    # like the reference's FILE loop), with or without a manifest.  The one
    # exception: non-byte-aligned widths under the fused/sharded pipelines
    # still run the in-memory bytes path (the sharded XLA fallback).
    if (
        args.mode == "encode"
        and args.backend == "jax"
        and (args.pipeline == "host" or params.width % 8 == 0)
    ):
        from .models import codec

        stats = codec.EncodeStats()
        try:
            kwargs = _block_kwargs(args, params)
            if args.pipeline == "sharded":
                import jax

                from .parallel import mesh as mesh_lib

                kwargs["mesh"] = _make_mesh_from_args(args)
                kwargs["interpret"] = jax.devices()[0].platform == "cpu"
                kwargs.setdefault(
                    "batch_blocks",
                    2 * kwargs["mesh"].shape[mesh_lib.DATA_AXIS],
                )
            from .utils import profiling

            with profiling.trace(args.profile):
                codec.encode_file(
                    args.input[0], args.output[0], params,
                    matcher=args.matcher, stats=stats,
                    manifest_path=args.manifest,
                    resume=args.resume, pipeline=args.pipeline, **kwargs,
                )
        except (ValueError, RuntimeError) as e:
            print(f"Encode error: {e}", file=sys.stderr)
            return 1
        if args.report:
            dt = time.perf_counter() - t0
            rep = {
                "mode": "encode", "backend": "jax",
                "resumable": bool(args.manifest),
                "pipeline": args.pipeline, "matcher": args.matcher,
                "seconds": round(dt, 6), "input_bytes": stats.input_bytes,
                "output_bytes": stats.output_bytes, "tokens": stats.tokens,
                "blocks": stats.blocks, "ratio": round(stats.ratio, 6),
                "page_release": stats.page_release,
                "mb_per_s": round(stats.input_bytes / dt / 1e6, 3)
                if dt > 0 else None,
                "phases": {
                    k: round(v, 6)
                    for k, v in stats.phases.as_dict().items()
                },
                "peak_rss_mb": _peak_rss_mb(),
            }
            if stats.h2d_bytes:
                rep["h2d_bytes"] = stats.h2d_bytes
                rep["d2h_bytes"] = stats.d2h_bytes
            if stats.shards:
                rep["shards"] = stats.shards
                rep["resyncs"] = stats.resyncs
                rep["resync_head_tokens"] = stats.resync_head_tokens
                rep["resync_bulk"] = stats.resync_bulk
            print(json.dumps(rep), file=sys.stderr)
        return 0

    # Remaining paths (numpy/native backends; host/device decode backends;
    # non-byte-aligned fused/sharded encode) operate on in-memory bytes.
    try:
        with open(args.input[0], "rb") as f:
            data = f.read()
    except OSError as e:
        print(f"Opening input file: {e.strerror}", file=sys.stderr)
        return 1
    try:
        from .utils import profiling

        with profiling.trace(args.profile):
            if args.mode == "encode":
                result, report = _encode(data, params, args)
            else:
                result, report = _decode(data, args)
    except (ValueError, RuntimeError) as e:
        # Clean diagnostic, nonzero exit.  Decode failures mirror the
        # reference's stream-error wording (lz77.c:273-277); encode-side
        # errors (bad parameters, backend limits) get an honest message
        # instead of a misleading bit-read complaint.
        if args.mode == "decode":
            print(f"Error reading bits: {e}", file=sys.stderr)
        else:
            print(f"Encode error: {e}", file=sys.stderr)
        return 1
    dt = time.perf_counter() - t0

    try:
        with open(args.output[0], "wb") as f:
            f.write(result)
    except OSError as e:
        print(f"Opening output file: {e.strerror}", file=sys.stderr)
        return 1

    if args.report:
        report.update(
            mode=args.mode,
            seconds=round(dt, 6),
            input_bytes=len(data),
            output_bytes=len(result),
            mb_per_s=round(len(data) / dt / 1e6, 3) if dt > 0 else None,
            peak_rss_mb=_peak_rss_mb(),
        )
        print(json.dumps(report), file=sys.stderr)
    return 0


def _peak_rss_mb() -> float:
    """This process's own peak RSS (MB) — the number that pins bounded-
    memory claims in --report (a parent's getrusage(RUSAGE_CHILDREN) max
    is polluted by fork-time COW inheritance and unrelated children)."""
    import resource

    return round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1
    )


def _block_kwargs(args, params: spec.Params) -> dict:
    """Encoder batching knobs (never affect the stream format).

    Without an explicit --block-size, the pallas_bitplane matcher gets its
    tile-exact preferred geometry (~124 KiB at defaults) — measured 1.8x
    the naive 64 KiB block on v5e.
    """
    from .ops import match as match_ops

    args.matcher = match_ops.route_matcher(args.matcher, params.la)
    kwargs = {}
    if args.block_size:
        kwargs["block_size"] = args.block_size
    elif args.matcher == "pallas_bitplane":
        from .ops import pallas_bitplane

        kwargs["block_size"] = pallas_bitplane.preferred_block_size(
            params.la, params.sb
        )
    if args.batch_blocks:
        kwargs["batch_blocks"] = args.batch_blocks
    return kwargs


def _make_mesh_from_args(args):
    """Build the (data, win) mesh from --mesh (default: all devices on data)."""
    from .parallel import mesh as mesh_lib

    if args.mesh:
        try:
            n_data, n_win = (int(v) for v in args.mesh.lower().split("x"))
        except ValueError:
            raise ValueError(
                f"--mesh must look like '4x2', got {args.mesh!r}"
            ) from None
        return mesh_lib.make_mesh(n_data=n_data, n_win=n_win)
    return mesh_lib.make_mesh()


def _encode(data: bytes, params: spec.Params, args):
    if args.backend == "numpy":
        from .models import spec_np

        return spec_np.encode(data, params), {"backend": "numpy"}
    if args.backend == "native":
        from . import native

        return (
            native.encode(data, params, threads=args.threads),
            {"backend": "native", "threads": args.threads or "auto"},
        )
    from .models import codec

    stats = codec.EncodeStats()
    kwargs = _block_kwargs(args, params)
    if args.pipeline == "fused":
        from .models import fused

        out = fused.encode_bytes_fused(
            data, params, matcher=args.matcher, stats=stats, **kwargs
        )
    elif args.pipeline == "sharded":
        import jax

        from .parallel import mesh as mesh_lib
        from .parallel import sharded

        mesh = _make_mesh_from_args(args)
        on_cpu = jax.devices()[0].platform == "cpu"
        kwargs.setdefault(
            "batch_blocks", 2 * mesh.shape[mesh_lib.DATA_AXIS]
        )
        out = sharded.encode_bytes_sharded(
            data, params, mesh=mesh, matcher=args.matcher, stats=stats,
            interpret=on_cpu, **kwargs
        )
    else:
        out = codec.encode_bytes(
            data, params, matcher=args.matcher, stats=stats, **kwargs
        )
    return out, {
        "backend": "jax",
        "pipeline": args.pipeline,
        "matcher": args.matcher,
        "tokens": stats.tokens,
        "blocks": stats.blocks,
        "ratio": round(stats.ratio, 6),
        "phases": {
            k: round(v, 6) for k, v in stats.phases.as_dict().items()
        },
    }


def _decode(data: bytes, args):
    if args.backend == "numpy":
        from .models import spec_np

        return spec_np.decode(data), {"backend": "numpy"}
    if args.backend == "native":
        from . import native

        return native.decode(data), {"backend": "native"}
    from .models import codec

    st = codec.DecodeStats()
    out = codec.decode_bytes(data, backend=args.decode_backend, stats=st)
    return out, {"backend": "jax", "decode_backend": st.backend}


if __name__ == "__main__":
    sys.exit(main())
