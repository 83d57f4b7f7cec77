from .infer import (InferenceModel, inference_model, init_model,
                    show_result_pyplot)
