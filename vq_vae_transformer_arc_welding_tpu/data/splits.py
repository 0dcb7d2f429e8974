"""Benchmark split definitions for the ASIMoW dataset.

The (experiment, welding_run) validation/test assignment is dataset
metadata fixed by the reference benchmark (dataloader/utils.py:46-68);
reproducing the exact tuples is required for comparable F1.
"""
from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class DataSplitId:
    """Selects one welding run of one experiment for val/test
    (reference dataloader/asimow_dataloader.py:15-25)."""
    experiment: int
    welding_run: int

    def __repr__(self):
        return (f"DataSplit(self.experiment={self.experiment}, "
                f"self.welding_run={self.welding_run})")


def get_val_test_ids() -> dict:
    return {
        "test_ids": ((3, 32), (3, 18), (1, 27), (3, 19),
                     (3, 17), (2, 21), (1, 20), (1, 11)),
        "val_ids": ((3, 3), (2, 10), (1, 24), (3, 24),
                    (1, 32), (2, 1), (1, 10), (1, 16)),
    }
