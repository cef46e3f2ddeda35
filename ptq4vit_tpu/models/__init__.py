from . import swin, vit
from .registry import MODEL_ZOO, Net, get_net, model_config
