from scaling_rgcn_training_tpu.graphs.graph import Graph
from scaling_rgcn_training_tpu.graphs.dataset import Dataset
from scaling_rgcn_training_tpu.graphs.device import DeviceGraph, build_device_graph

__all__ = ["Graph", "Dataset", "DeviceGraph", "build_device_graph"]
