"""CaloChallenge ``binning.xml`` geometry parser.

Fresh numpy implementation of the geometry bookkeeping the reference does in
``experiments/calo_utils/ugr_evaluation/XMLHandler.py``: per-layer radial edges
and alpha-bin counts, flat voxel bin edges, and per-voxel (eta, phi) positions.

Voxel ordering convention (must match the HDF5 files): within a layer the flat
index runs alpha-major — ``flat = alpha_bin * n_r + r_bin`` — and layers are
concatenated in id order.
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field

import numpy as np


@dataclass
class LayerBinning:
    layer_id: int
    r_edges: np.ndarray  # (n_r + 1,)
    n_alpha: int

    @property
    def n_r(self) -> int:
        return len(self.r_edges) - 1

    @property
    def n_bins(self) -> int:
        return self.n_r * self.n_alpha

    @property
    def r_mid(self) -> np.ndarray:
        return 0.5 * (self.r_edges[:-1] + self.r_edges[1:])

    @property
    def alpha_mid(self) -> np.ndarray:
        edges = np.linspace(-math.pi, math.pi, self.n_alpha + 1)
        return 0.5 * (edges[:-1] + edges[1:])


@dataclass
class XMLHandler:
    """Parsed calorimeter geometry for one particle type."""

    particle_name: str
    filename: str = "binning.xml"
    layers: list[LayerBinning] = field(default_factory=list)

    def __post_init__(self):
        root = ET.parse(self.filename).getroot()
        particle = None
        for node in root:
            if node.attrib.get("name") == self.particle_name:
                particle = node
                break
        if particle is None:
            raise ValueError(f"Particle {self.particle_name} not found in {self.filename}")
        for layer_node in particle:
            r_edges = np.array(
                [float(s) for s in layer_node.attrib["r_edges"].split(",")]
            )
            self.layers.append(
                LayerBinning(
                    layer_id=int(layer_node.attrib["id"]),
                    r_edges=r_edges,
                    n_alpha=int(layer_node.attrib["n_bin_alpha"]),
                )
            )

        self.bin_number = [layer.n_bins for layer in self.layers]
        self.totalBins = int(sum(self.bin_number))
        self.bin_edges = np.concatenate([[0], np.cumsum(self.bin_number)]).astype(int)
        self.relevantlayers = [i for i, lyr in enumerate(self.layers) if lyr.n_r > 0]
        self.layerWithBinningInAlpha = [
            lyr.layer_id for lyr in self.layers if lyr.n_alpha > 1
        ]
        self.r_edges = [list(lyr.r_edges) for lyr in self.layers]
        self.a_bins = [lyr.n_alpha for lyr in self.layers]
        self.r_bins = [lyr.n_r for lyr in self.layers]

        self.eta_all_layers, self.phi_all_layers = self._voxel_eta_phi()

    def _voxel_eta_phi(self):
        """Per-voxel cartesian positions, alpha-major flat ordering per layer."""
        etas, phis = [], []
        for lyr in self.layers:
            if lyr.n_r == 0:
                etas.append(np.zeros(0))
                phis.append(np.zeros(0))
                continue
            # alpha-major: outer loop alpha, inner loop r
            r = np.tile(lyr.r_mid, lyr.n_alpha)
            a = np.repeat(lyr.alpha_mid, lyr.n_r)
            etas.append(r * np.cos(a))
            phis.append(r * np.sin(a))
        return etas, phis

    # -- reference-compatible accessors ---------------------------------------
    def GetTotalNumberOfBins(self):
        return self.totalBins

    def GetBinEdges(self):
        return self.bin_edges

    def GetEtaPhiAllLayers(self):
        return self.eta_all_layers, self.phi_all_layers

    def GetRelevantLayers(self):
        return self.relevantlayers

    def GetLayersWithBinningInAlpha(self):
        return self.layerWithBinningInAlpha


def layer_boundaries(xml_filename: str, particle_type: str) -> np.ndarray:
    """Unique flat voxel boundaries of the calorimeter layers."""
    return np.unique(XMLHandler(particle_type, xml_filename).GetBinEdges())
