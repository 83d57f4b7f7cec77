# Cityscapes semantic segmentation (19 trainId classes).  The reference ships
# an orphaned old-mmseg-format config (SURVEY.md 8.9); this one runs against
# the CityscapesDataset implemented in this framework.
dataset = dict(train=dict(type='CityscapesDataset',
                          data_root='/sharespace/datasets/cityscapes/',
                          img_dir='leftImg8bit/train',
                          ann_dir='gtFine/train',
                          pipeline='configs/augmentation/defautlt_training_transform.yaml'),
               val=dict(type='CityscapesDataset',
                        data_root='/sharespace/datasets/cityscapes/',
                        img_dir='leftImg8bit/val',
                        ann_dir='gtFine/val',
                        return_ori_seg_gt=True,
                        pipeline='configs/augmentation/defautlt_val_transform.yaml'),
               test=dict(type='CityscapesDataset',
                         data_root='/sharespace/datasets/cityscapes/',
                         img_dir='leftImg8bit/val',
                         ann_dir='gtFine/val',
                         pipeline='configs/augmentation/defautlt_val_transform.yaml'))
