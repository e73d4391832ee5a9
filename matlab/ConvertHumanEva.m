% Export synchronized HumanEva-I mocap streams to per-action .mat files that
% videopose3d_tpu.data.prepare.humaneva consumes.
%
% Equivalent purpose to the reference's data/ConvertHumanEva.m.  Requires the
% official HumanEva-I MATLAB toolbox (http://humaneva.is.tue.mpg.de/) on the
% MATLAB path plus the dataset's mocap + calibration files.
%
% For every (split, subject, action, trial) in the toolbox's own partitioning
% this writes
%   <out>/<Split>/<Subject>/<Action>_<trial>.mat
% containing:
%   poses_3d : [frames x joints x 3]         world-space positions in mm
%                                            (NaN rows for invalid mocap frames)
%   poses_2d : [cams x frames x joints x 2]  per-camera projected 2D pixels
%
% The per-split frame ranges come from the toolbox partition structure
% (he_dataset), so Train/ and Validate/ exports cover disjoint frame ranges
% that match the index tables in videopose3d_tpu/data/prepare/humaneva.py.
% The 15-joint "virtual markers" layout is used (set N_JOINTS = 20 for the
% extended layout).

CAMERAS   = {'C1', 'C2', 'C3'};
SPLITS    = {'Train', 'Validate'};
N_JOINTS  = 15;
DATA_ROOT = './HumanEva';     % dataset root (Mocap_Data, Calibration_Data, ...)
OUT_ROOT  = './converted_15j';

for si = 1:numel(SPLITS)
    split = SPLITS{si};
    % Toolbox partition: one entry per (subject, action, trial) with the
    % split's own frame range.
    dataset = he_dataset('HumanEvaI', split);

    for di = 1:length(dataset)
        subject = char(get(dataset(di), 'SubjectName'));
        action  = char(get(dataset(di), 'ActionType'));
        trial   = get(dataset(di), 'Trial');
        frame_start = get(dataset(di), 'FrameStart');
        frame_end   = get(dataset(di), 'FrameEnd');
        % Per-camera start frames (sync offsets); mocap range is their span.
        fs = max(cell2mat(frame_start));
        fe = min(cell2mat(frame_end));
        n_frames = fe - fs + 1;           % inclusive range
        fprintf('%s / %s / %s %d: frames %d..%d\n', ...
                split, subject, action, trial, fs, fe);

        mocap_stream = sync_stream(dataset(di));

        poses_3d = nan(n_frames, N_JOINTS, 3);
        poses_2d = nan(numel(CAMERAS), n_frames, N_JOINTS, 2);

        for f = 1:n_frames
            [pose, valid] = cur_frame(mocap_stream, fs + f - 1, N_JOINTS);
            if ~valid
                continue   % leave NaNs: the Python converter splits chunks here
            end
            poses_3d(f, :, :) = pose;
            for ci = 1:numel(CAMERAS)
                cal = load_calibration(DATA_ROOT, subject, CAMERAS{ci});
                poses_2d(ci, f, :, :) = project2d(pose, cal);
            end
        end

        out_dir = fullfile(OUT_ROOT, split, subject);
        if ~exist(out_dir, 'dir'); mkdir(out_dir); end
        out = fullfile(out_dir, sprintf('%s_%d.mat', action, trial));
        save(out, 'poses_3d', 'poses_2d');
    end
end
fprintf('done\n');
