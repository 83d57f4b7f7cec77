from .export import (export_inference, load_exported, save_exported,
                     serve_fn)
from .infer import (InferenceModel, inference_model, init_model,
                    show_result_pyplot)
