"""Measure the ACTUAL PyTorch reference (lucidrains/gigagan-pytorch @
/root/reference) running its README quickstart train step on this host's
CPU — the measured anchor behind bench.py's A100 denominator estimate
(VERDICT r4 weak #5 / next-round item 6).

What runs is the reference's own code (gigagan_pytorch.GigaGAN driven
through its `forward(steps=...)` trainer loop, README.md:39-92 config,
batch 1 x grad_accum 8, GP every 4th step).  The image lacks six of its
dependencies (torchvision, beartype, kornia, ema_pytorch, open_clip,
numerize); `_install_stubs()` provides functional equivalents.  The only
stub on the COMPUTE path is kornia's `filter2d` (an exact depthwise-conv
reimplementation of a normalized 3x3 blur — negligible FLOPs); EMA is a
faithful lerp implementation; the rest are import-time shims.

Outputs one JSON line:
  - reference seconds/effective-iter and images/sec on this CPU
  - this CPU's achieved fp32 matmul GFLOP/s (practical peak, measured)
  - the reference's achieved FLOP/s and model-FLOPs utilization (MFU)
    against that practical peak

The MFU number is the evidence for the A100 estimate's utilization band:
see bench.py A100_REFERENCE_IMAGES_PER_SEC_ESTIMATE and DESIGN.md
("Baseline denominator derivation").

Usage: python scripts/bench_reference_cpu.py  (CPU-only; ~15-25 min on
one core — step FLOPs are ~9.7-16.5 TFLOP/effective-iter at batch 8)
"""

import json
import os
import sys
import time
import types
import typing

REF = "/root/reference"
STEPS_TIMED = int(os.environ.get("REF_STEPS", "4"))
TORCH_THREADS = int(os.environ.get("REF_THREADS", "0"))  # 0 = torch default


def _install_stubs():
    import torch
    import torch.nn.functional as F
    from torch import nn

    # --- torchvision: only `utils.save_image` (no-op'd; we don't sample
    # during the timed window) and `transforms` (module-level import in
    # data.py; our driver uses its own DataLoader) ---------------------
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.save_image = lambda *a, **k: None
    tvt = types.ModuleType("torchvision.transforms")
    for name in ("Compose", "Resize", "ToTensor", "CenterCrop",
                 "RandomHorizontalFlip", "Lambda"):
        setattr(tvt, name, lambda *a, **k: (lambda x: x))
    tv.utils, tv.transforms = tvu, tvt
    sys.modules.update({"torchvision": tv, "torchvision.utils": tvu,
                        "torchvision.transforms": tvt})

    # --- beartype: identity decorator; typing passthrough --------------
    bt = types.ModuleType("beartype")
    bt.beartype = lambda fn=None, **kw: (
        fn if fn is not None else (lambda f: f))
    btt = types.ModuleType("beartype.typing")
    btt.__dict__.update(typing.__dict__)
    btd = types.ModuleType("beartype.door")

    def is_bearable(obj, hint):
        origin = typing.get_origin(hint) or hint
        try:
            return isinstance(obj, origin)
        except TypeError:
            return True

    btd.is_bearable = is_bearable
    bt.typing, bt.door = btt, btd
    sys.modules.update({"beartype": bt, "beartype.typing": btt,
                        "beartype.door": btd})

    # --- kornia.filters.filter2d: exact functional equivalent ----------
    # (reference Blur: f=[1,2,1] outer product, normalized=True,
    # gigagan_pytorch.py:252-255). Depthwise conv with reflect padding,
    # kernel normalized to sum 1 — matches kornia semantics for the
    # (1,kh,kw) kernels the reference passes.
    kor = types.ModuleType("kornia")
    korf = types.ModuleType("kornia.filters")

    def filter2d(x, kernel, normalized=False, border_type="reflect"):
        b, c, h, w = x.shape
        k = kernel.to(x)
        if normalized:
            k = k / k.sum(dim=(-1, -2), keepdim=True)
        kb, kh, kw = k.shape
        if kb == 1:
            weight = k.expand(c, 1, kh, kw).contiguous()
            groups = c
        else:  # per-batch kernels (unused by the reference image path)
            raise NotImplementedError("per-batch filter2d")
        xp = F.pad(x, (kw // 2, kw // 2, kh // 2, kh // 2),
                   mode="reflect" if border_type == "reflect" else
                   "constant")
        return F.conv2d(xp, weight, groups=groups)

    def filter3d(x, kernel, normalized=False, border_type="replicate"):
        raise NotImplementedError("video path not exercised")

    korf.filter2d, korf.filter3d = filter2d, filter3d
    kor.filters = korf
    sys.modules.update({"kornia": kor, "kornia.filters": korf})

    # --- ema_pytorch.EMA: faithful minimal implementation --------------
    import copy as _copy

    class EMA(nn.Module):
        def __init__(self, model, beta=0.9999, update_every=10,
                     update_after_step=100, **kw):
            super().__init__()
            self._model = [model]  # unregistered ref
            self.ema_model = _copy.deepcopy(model)
            for p in self.ema_model.parameters():
                p.requires_grad_(False)
            self.beta = beta
            self.update_every = update_every
            self.update_after_step = update_after_step
            self.register_buffer("step", torch.tensor(0))

        @torch.no_grad()
        def update(self):
            self.step += 1
            step = int(self.step.item())
            if step % self.update_every:
                return
            src = self._model[0]
            if step <= self.update_after_step:
                self.ema_model.load_state_dict(src.state_dict())
                return
            for pe, pm in zip(self.ema_model.state_dict().values(),
                              src.state_dict().values()):
                if pe.dtype.is_floating_point:
                    pe.lerp_(pm, 1.0 - self.beta)
                else:
                    pe.copy_(pm)

        def forward(self, *a, **kw):
            return self.ema_model(*a, **kw)

    emam = types.ModuleType("ema_pytorch")
    emam.EMA = EMA
    sys.modules["ema_pytorch"] = emam

    # --- open_clip: import-time shim (unconditional quickstart never
    # constructs OpenClipAdapter) ---------------------------------------
    sys.modules["open_clip"] = types.ModuleType("open_clip")

    # --- numerize: `from numerize import numerize; numerize.numerize(n)`
    inner = types.SimpleNamespace(numerize=lambda n, *a: str(n))
    num = types.ModuleType("numerize")
    num.numerize = inner
    sys.modules["numerize"] = num


def measure_cpu_matmul_peak():
    """Achieved fp32 matmul GFLOP/s on this host — the 'practical peak'
    denominator for the MFU number (big square matmul, best of 3)."""
    import torch

    n = 1536
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    torch.mm(a, b)  # warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        torch.mm(a, b)
        best = min(best, time.perf_counter() - t0)
    return 2 * n ** 3 / best / 1e9


def main():
    if TORCH_THREADS:
        import torch

        torch.set_num_threads(TORCH_THREADS)
    _install_stubs()
    sys.path.insert(0, REF)
    import torch
    from torch.utils.data import DataLoader, TensorDataset

    from gigagan_pytorch import GigaGAN

    os.chdir("/tmp")  # reference writes ./gigagan-models etc. relative

    gan = GigaGAN(
        generator=dict(
            style_network=dict(dim=64, depth=4),
            image_size=256,
            dim_capacity=8,
            dim_max=512,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        discriminator=dict(
            dim_capacity=16,
            dim_max=512,
            image_size=256,
            num_skip_layers_excite=4,
            unconditional=True,
        ),
        amp=False,  # CUDA amp is unavailable on CPU; fp32 (favors neither)
        num_samples=1,  # sampling happens only in the warmup steps
        model_folder="/tmp/ref-cpu-bench/models",
        results_folder="/tmp/ref-cpu-bench/results",
    )

    # quickstart shape: batch 1, grad_accum 8 (README.md:76-88)
    images = torch.rand(16, 3, 256, 256)
    dl = DataLoader(TensorDataset(images), batch_size=1, shuffle=False,
                    collate_fn=lambda rows: torch.stack(
                        [r[0] for r in rows]))
    gan.set_dataloader(dl)

    print("# warmup (steps 0-1: includes the save/sample path)",
          flush=True)
    gan(steps=2, grad_accum_every=8)

    print(f"# timing {STEPS_TIMED} steps (GP cadence 1-in-4)", flush=True)
    t0 = time.perf_counter()
    gan(steps=STEPS_TIMED, grad_accum_every=8)
    elapsed = time.perf_counter() - t0
    sec_per_iter = elapsed / STEPS_TIMED
    images_per_sec = 8 / sec_per_iter  # effective batch 8

    peak = measure_cpu_matmul_peak()
    # step FLOPs from XLA cost analysis of the equivalent step graphs
    # (scripts/flops_step.py, DESIGN.md): D-step 6.65 TF (13.5 with GP),
    # G-step 3.0 TF at effective batch 8 -> GP-cadence-weighted average
    flops_per_iter = 0.75 * (6.65e12 + 3.0e12) + 0.25 * (13.5e12 + 3.0e12)
    achieved = flops_per_iter / sec_per_iter
    result = {
        "what": "PyTorch reference README quickstart on host CPU "
                "(batch 1 x accum 8, fp32, GP every 4th step)",
        "torch_threads": torch.get_num_threads(),
        "sec_per_effective_iter": round(sec_per_iter, 2),
        "reference_cpu_images_per_sec": round(images_per_sec, 4),
        "cpu_fp32_matmul_gflops_practical_peak": round(peak, 1),
        "reference_achieved_gflops": round(achieved / 1e9, 1),
        "reference_mfu_vs_practical_peak": round(achieved / (peak * 1e9),
                                                 4),
        "flops_per_iter_model": flops_per_iter,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
