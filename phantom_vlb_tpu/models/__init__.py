from phantom_vlb_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower
from phantom_vlb_tpu.models.heads import BrainReadoutHead, HRFPool, RidgeHead
from phantom_vlb_tpu.models.lora import LoRAConfig, LoRADense
from phantom_vlb_tpu.models.mistral import MistralConfig, MistralForCausalLM, MistralModel
from phantom_vlb_tpu.models.stc_connector import STCConfig, STCConnector
from phantom_vlb_tpu.models.videollama2 import VLBConfig, VideoLLaMA2VLB

__all__ = [
    "CLIPVisionConfig", "CLIPVisionTower",
    "BrainReadoutHead", "HRFPool", "RidgeHead",
    "LoRAConfig", "LoRADense",
    "MistralConfig", "MistralForCausalLM", "MistralModel",
    "STCConfig", "STCConnector",
    "VLBConfig", "VideoLLaMA2VLB",
]
