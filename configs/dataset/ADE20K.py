# ADE20K scene parsing (150 classes, reduce_zero_label).  Standard
# ADEChallengeData2016 layout; point data_root at your copy.
dataset = dict(train=dict(type='ADE20KDataset',
                          data_root='/sharespace/datasets/ADEChallengeData2016/',
                          img_dir='images/training',
                          ann_dir='annotations/training',
                          pipeline='configs/augmentation/defautlt_training_transform.yaml'),
               val=dict(type='ADE20KDataset',
                        data_root='/sharespace/datasets/ADEChallengeData2016/',
                        img_dir='images/validation',
                        ann_dir='annotations/validation',
                        return_ori_seg_gt=True,
                        pipeline='configs/augmentation/defautlt_val_transform.yaml'),
               test=dict(type='ADE20KDataset',
                         data_root='/sharespace/datasets/ADEChallengeData2016/',
                         img_dir='images/validation',
                         ann_dir='annotations/validation',
                         pipeline='configs/augmentation/defautlt_val_transform.yaml'))
