"""DetectionDataset — union of ASVspoof2021-DF + WaveFake + FakeAVCeleb.

Equivalent of the reference (reference:
src/datasets/detection_dataset.py:15-119): pd.concat of per-source
manifests, bonafide oversampling with replacement to the spoof count,
optional undersampling, and the seed-42 ``reduced_number`` subsample.
"""
from __future__ import annotations

import logging
from typing import List, Optional

import pandas as pd

from adaa_tpu.data.datasets import (
    DeepFakeASVSpoofDataset,
    FakeAVCelebDataset,
    SimpleAudioFakeDataset,
    WaveFakeDataset,
)

LOGGER = logging.getLogger(__name__)


class DetectionDataset(SimpleAudioFakeDataset):
    def __init__(
        self,
        asvspoof_path=None,
        wavefake_path=None,
        fakeavceleb_path=None,
        subset: str = "val",
        transform=None,
        oversample: bool = True,
        undersample: bool = False,
        return_label: bool = True,
        reduced_number: Optional[int] = None,
        return_meta: bool = False,
        return_raw: bool = False,
    ):
        super().__init__(
            subset=subset,
            transform=transform,
            return_label=return_label,
            return_meta=return_meta,
            return_raw=return_raw,
        )
        datasets = self._init_datasets(
            asvspoof_path, wavefake_path, fakeavceleb_path, subset
        )
        self.samples = pd.concat(
            [ds.samples for ds in datasets], ignore_index=True
        )

        if oversample:
            self.oversample_dataset()
        elif undersample:
            self.undersample_dataset()

        if reduced_number:
            LOGGER.info("Using reduced number of samples - %s!", reduced_number)
            self.samples = self.samples.sample(
                min(len(self.samples), reduced_number), random_state=42
            )

    def _init_datasets(
        self, asvspoof_path, wavefake_path, fakeavceleb_path, subset
    ) -> List[SimpleAudioFakeDataset]:
        datasets = []
        if asvspoof_path is not None:
            datasets.append(DeepFakeASVSpoofDataset(asvspoof_path, subset=subset))
        if wavefake_path is not None:
            datasets.append(WaveFakeDataset(wavefake_path, subset=subset))
        if fakeavceleb_path is not None:
            datasets.append(FakeAVCelebDataset(fakeavceleb_path, subset=subset))
        return datasets

    def oversample_dataset(self):
        samples = self.samples.groupby(by="label")
        bona_length = len(samples.groups["bonafide"])
        spoof_length = len(samples.groups["spoof"])
        diff_length = spoof_length - bona_length
        if diff_length < 0:
            raise NotImplementedError
        if diff_length > 0:
            bonafide = samples.get_group("bonafide").sample(
                diff_length, replace=True
            )
            self.samples = pd.concat([self.samples, bonafide], ignore_index=True)

    def undersample_dataset(self):
        samples = self.samples.groupby(by="label")
        bona_length = len(samples.groups["bonafide"])
        spoof_length = len(samples.groups["spoof"])
        if spoof_length < bona_length:
            raise NotImplementedError
        if spoof_length > bona_length:
            spoofs = samples.get_group("spoof").sample(bona_length, replace=True)
            self.samples = pd.concat(
                [samples.get_group("bonafide"), spoofs], ignore_index=True
            )

    def get_bonafide_only(self):
        self.samples = self.samples.groupby(by="label").get_group("bonafide")
        return self.samples

    def get_spoof_only(self):
        self.samples = self.samples.groupby(by="label").get_group("spoof")
        return self.samples
