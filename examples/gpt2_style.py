"""GPT-2-style proving demo at the reference's benchmark quantization scale.

Reference analogue: jolt-atlas-core/examples/gpt2.rs — GPT-2 (125M params,
12 layers, 12 heads, n_embd 768, seq_len 16, scale 2^12; README.md:66-73).

The default proves a proportional SLICE (2 layers, 4 heads, n_embd 128,
seq 16, vocab 8192, scale 2^12) exercising the GPT-2 code paths —
multi-head attention, scale-2^12 teleport activations and softmax layout,
vocab-scale gather + wide LM head — in a few minutes on this host.

Flags (plus every nanogpt_style flag, e.g. --trace / --zk / --gen):
  --fullvocab  the true 50257-token vocabulary (pads to 65536; the LM-head
               satclamp family runs over T = seq*65536 cycles — feasible
               since the sparse two-phase booleanity schedule, see
               subprotocols/onehot.py)
  --full       the true 125M shape (12L/12H/768 + full vocab); exists to
               demonstrate the pipeline handles the shape, not a quick run
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nanogpt_style import main as nanogpt_main  # noqa: E402


def main(argv: list[str]) -> int:
    full = "--full" in argv
    fullvocab = full or "--fullvocab" in argv
    argv = [a for a in argv if a not in ("--full", "--fullvocab")]
    vocab = "50257" if fullvocab else "8192"
    if full:
        # the reference pads every tensor dim to a power of two at load
        # (atlas-onnx-tracer model/load.rs:504): GPT-2's 768-dim / 12-head
        # tensors prove as 1024-dim / 16-head zero-padded shapes, vocab
        # 50257 -> 65536. This is the shape the reference's 14.9 s
        # flagship number actually pays for (README.md:66-73).
        cfg = ["--blocks", "12", "--dim", "1024", "--seq", "16",
               "--vocab", vocab, "--heads", "16"]
    else:
        cfg = ["--blocks", "2", "--dim", "128", "--seq", "16",
               "--vocab", vocab, "--heads", "4"]
    sys.argv = [sys.argv[0], "--scale", "12"] + cfg + argv
    return nanogpt_main() or 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
