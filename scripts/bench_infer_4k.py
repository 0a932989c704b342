"""4K-only inference receipt runner.

The 1K→4K upsampler latency is a multi-minute remote compile through this
relay; running it standalone (warm persistent cache for everything else)
lets the receipt land without re-measuring the fast rows of
scripts/bench_infer.py.  Prints the same incremental `# key = value` lines
plus one final JSON line with only the 4K keys.
"""
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench_infer  # noqa: E402  (scripts/ sibling)

if __name__ == "__main__":
    result = {}
    t, s = bench_infer.upsampler_latency(1024, 4096, full_attn=(False,) * 5)
    result["upsample_1k_to_4k_latency_s"] = round(t, 4)
    result["upsample_1k_to_4k_single_dispatch_s"] = round(s, 4)
    result["upsample_1k_to_4k_config"] = "all linear attention"
    result["paper_a100_4k_latency_s"] = 3.66
    for k, v in result.items():
        bench_infer._note(k, v)
    print(json.dumps(result))
