"""Debug/inspection writers mirroring the reference's output formats.

  * tagged_lines — the console batch predictor's aligned two-row blocks
    (word row + label row, 'O'→'-'), ConsoleDemo/Program.cs:275-315
  * validation_lines — the 'src:/ref:/hyp:' triple blocks,
    BaseSeq2SeqFramework.cs:854-902

Driver-side pretty-printers over small samples only; bulk output is
Parquet (stages/materialize layout).
"""
from __future__ import annotations


def tagged_lines(words: list[str], labels: list[str]) -> str:
    """Two aligned rows: words and their labels, each column padded to the
    wider of the pair; 'O' rendered as '-' (Program.cs:292-308)."""
    cells = []
    for w, l in zip(words, labels):
        l = "-" if l == "O" else l
        width = max(len(w), len(l))
        cells.append((w.ljust(width), l.ljust(width)))
    row1 = "  ".join(c[0] for c in cells).rstrip()
    row2 = "  ".join(c[1] for c in cells).rstrip()
    return f"{row1}\n{row2}\n"


def validation_lines(src: list[str], ref: list[str], hyp: list[str]) -> str:
    """src:/ref:/hyp: aligned block per sentence (BaseSeq2SeqFramework.cs:
    854-902)."""
    return (
        f"src: {' '.join(src)}\n"
        f"ref: {' '.join(ref)}\n"
        f"hyp: {' '.join(hyp)}\n"
    )
