# Kvasir-shaped synthetic data (640x640 pipeline) for TPU smoke/bench runs.
dataset = dict(train=dict(type='SyntheticDataset', length=64,
                          image_size=(640, 640),
                          pipeline='configs/augmentation/defautlt_training_transform.yaml'),
               val=dict(type='SyntheticDataset', length=16,
                        image_size=(640, 640), seed=1, return_ori_seg_gt=True,
                        pipeline='configs/augmentation/defautlt_val_transform.yaml'),
               test=dict(type='SyntheticDataset', length=16,
                         image_size=(640, 640), seed=2,
                         pipeline='configs/augmentation/defautlt_val_transform.yaml'))
